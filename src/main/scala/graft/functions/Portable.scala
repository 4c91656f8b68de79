package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing, shared by the dedup /
  * similarity / fingerprint operators and their DuckDB oracles.
  *
  * Spark's `hash`/`xxhash64` and DuckDB's `hash` are different
  * algorithms, so differential checks need a hash both engines compute
  * identically. md5 is: both produce the same lowercase hex over UTF-8
  * bytes. The first 15 hex chars (60 bits) parse into a non-negative
  * BIGINT on both sides:
  *
  *   Spark : CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
  *   DuckDB: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)
  *
  * All expressions here are built-in Catalyst functions — codegen'd,
  * no UDFs, fully distributed.
  */
object Portable {

  /** 60-bit non-negative hash of a string column. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** SQL fragment computing [[hash60]] in DuckDB. `s` is a SQL expr. */
  def duckHash60(s: String): String =
    s"CAST(concat('0x', substr(md5($s), 1, 15)) AS BIGINT)"

  /** Keyed hash family for MinHash: seed `i` mixed into the input. */
  def hash60Keyed(i: Int, c: Column): Column =
    hash60(concat(lit(i.toString), lit(":"), c))

  def duckHash60Keyed(i: Int, s: String): String =
    duckHash60(s"concat('$i', ':', $s)")
}
