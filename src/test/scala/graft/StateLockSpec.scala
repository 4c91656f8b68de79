package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** State-store SCHEMA lockfile over every streaming (`st*`) query in
  * the registry — the streaming counterpart of `PlanLockSpec`.
  *
  * PlanLockSpec deliberately excludes streaming queries (micro-batch
  * physical plans are run-variant), which left 100+ queries with no
  * regression gate of the mm12 class. What IS deterministic and
  * production-critical for a stateful stream is its STATE-STORE
  * SCHEMA: the key/value struct each stateful operator persists in
  * the checkpoint. A checkpointed production query can only be
  * upgraded in place if that schema is unchanged — Spark's
  * StateSchemaCompatibilityChecker hard-fails the restart otherwise —
  * so a silent state-grain change (a column added to a groupBy key, a
  * dropDuplicates key widened, a flatMapGroupsWithState state class
  * reshaped) is a BREAKING change for every deployed checkpoint even
  * when the query's results stay correct. That is exactly the failure
  * class StateCapSpec's composite-key lesson (r13) hit by hand; this
  * spec machine-gates it:
  *
  *   - every `st*` query is REPLAYED at sf0.001; the checkpoints it
  *     creates are captured via `Tables.beginScratchRecording` (every
  *     checkpoint dir routes through `Tables.scratchDir` on the
  *     calling thread);
  *   - each checkpoint with a `state/` dir is introspected through
  *     Spark's public state data source (`state-metadata` for the
  *     operator/store inventory, `statestore` for each store's
  *     key/value struct — no private APIs, the same reader an
  *     operator would use to inspect a production checkpoint);
  *   - the resulting lines are diffed against the committed lockfile.
  *     Queries with no stateful operator are locked as `stateless`
  *     (a stateless→stateful change is also a restore-contract break:
  *     the old checkpoint has no state to feed the new operator).
  *
  * Any deliberate state-schema change must be acknowledged by
  * regenerating in the same commit:
  *
  *   GRAFT_UPDATE_STATE_LOCK=1 sbt "testOnly graft.StateLockSpec"
  *
  * The lockfile stores the FULL schema text (not a hash) so a review
  * of the regenerating commit shows exactly which operator's state
  * changed shape and how.
  */
class StateLockSpec extends SparkSpecBase {

  private val lockPath =
    Paths.get(sys.props("user.dir"), "src", "test", "resources", "state_lock.txt")

  /** The operator/store inventory + key/value schema of one
    * checkpoint, via the public state data source. Reading the schema
    * resolves from the checkpoint's own schema metadata; the
    * store-provider conf only matters for reading DATA, which this
    * never does.
    */
  private def checkpointLines(cp: String): Seq[String] = {
    val stores = spark.read.format("state-metadata").load(cp)
      .select("operatorId", "operatorName", "stateStoreName", "operatorProperties")
      .collect()
      .map(r => (r.getAs[Number]("operatorId").longValue(),
        r.getAs[String]("operatorName"), r.getAs[String]("stateStoreName"),
        r.getAs[String]("operatorProperties")))
      .sortBy(t => (t._1, t._3)).toSeq
    stores.flatMap { case (opId, opName, store, props) =>
      if (props != null && props.contains("stateVariables")) {
        // transformWithState: each named state variable is its own
        // column family, addressed by stateVarName (storeName reads
        // are rejected for this operator). The variable list — with
        // its type and TTL flag — is itself part of the restore
        // contract, so the names come from the checkpoint's own
        // operator properties, sorted for determinism.
        val vars = """"stateName":"([^"]+)"""".r
          .findAllMatchIn(props).map(_.group(1)).toSeq.sorted
        vars.map { v =>
          val st = spark.read.format("statestore")
            .option("operatorId", opId)
            .option("stateVarName", v)
            .load(cp)
          // MapState exposes (key, user_map_key, user_map_value);
          // Value/ListState expose (key, value) — digest whatever
          // schema the variable's type family presents.
          val cols = st.schema.fields.filter(_.name != "partition_id")
            .map(f => s"${f.name}=${f.dataType.sql}").mkString(" ")
          s"op$opId:$opName/var:$v $cols"
        }
      } else if (opName.contains("symmetricHashJoin")) {
        // Stream-stream join: addressed per SIDE, not per store —
        // the storeName layout is format-version-dependent (v2: four
        // stores, keyToNumValues + keyWithIndexToValue per side; v3,
        // the r18 big-state default: ONE "default" store with virtual
        // column families) and v3's internal families are not
        // flat-readable by storeName. The joinSide view is the stable
        // public read for both versions, and the store inventory is
        // kept in the line so a layout/format change still shows as a
        // lock diff (it IS a restore-contract break for a deployed
        // checkpoint — an existing checkpoint pins its version; only
        // new checkpoints adopt v3).
        val inventory = stores.filter(t => t._1 == opId).map(_._3)
          .sorted.mkString(",")
        if (store != stores.filter(t => t._1 == opId).map(_._3).min) Nil
        else Seq("left", "right").map { side =>
          val st = spark.read.format("statestore")
            .option("operatorId", opId)
            .option("joinSide", side)
            .load(cp)
          s"op$opId:$opName/stores[$inventory]/$side " +
            s"key=${st.schema("key").dataType.sql} " +
            s"value=${st.schema("value").dataType.sql}"
        }
      } else {
        val st = spark.read.format("statestore")
          .option("operatorId", opId)
          .option("storeName", store)
          .load(cp)
        Seq(s"op$opId:$opName/$store key=${st.schema("key").dataType.sql} " +
          s"value=${st.schema("value").dataType.sql}")
      }
    }
  }

  /** Replay every registered streaming query at sf0.001 and collect
    * its state lines — `queryName -> (cpIdx-prefixed store lines |
    * ["stateless"])`. Checkpoints are ordered by creation, so the
    * digest is deterministic for multi-run queries.
    */
  private lazy val computed: Seq[(String, Seq[String])] = {
    val names = graft.streaming.StreamQueries.queries.keys
      .filter(_.startsWith("st")).toSeq.sorted
    names.map { n =>
      Tables.beginScratchRecording()
      try graft.streaming.StreamQueries.queries(n)(spark, sf)
      finally ()
      val cps = Tables.drainScratchRecording()
        .filter(d => Files.isDirectory(Paths.get(d, "state")))
      val lines = cps.zipWithIndex.flatMap { case (cp, i) =>
        checkpointLines(cp).map(l => s"cp$i $l")
      }
      n -> (if (lines.isEmpty) Seq("stateless") else lines)
    }
  }

  test("state-store schemas match the committed lockfile") {
    val flat = computed.flatMap { case (n, ls) => ls.map(l => s"$n|$l") }
    if (sys.env.contains("GRAFT_UPDATE_STATE_LOCK")) {
      Files.createDirectories(lockPath.getParent)
      Files.write(lockPath,
        flat.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
      info(s"state lockfile regenerated: ${computed.size} queries, ${flat.size} lines")
    } else {
      assert(Files.exists(lockPath),
        "state lockfile missing — run GRAFT_UPDATE_STATE_LOCK=1 sbt 'testOnly graft.StateLockSpec'")
      val locked = scala.jdk.CollectionConverters.ListHasAsScala(
        Files.readAllLines(lockPath)).asScala.filter(_.nonEmpty)
        .map { l => val i = l.indexOf('|'); (l.substring(0, i), l.substring(i + 1)) }
        .toSeq.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val drifted = computed.collect {
        case (n, ls) if locked.contains(n) && locked(n) != ls =>
          s"$n: state schema changed\n  locked:   ${locked(n).mkString("; ")}\n  computed: ${ls.mkString("; ")}"
        case (n, _) if !locked.contains(n) => s"$n: new streaming query not in state lockfile"
      }
      val removed = locked.keySet -- computed.map(_._1).toSet
      assert(drifted.isEmpty && removed.isEmpty,
        "state-store schema drift — a checkpointed production query cannot restart " +
          "across this change; if intentional, regenerate with " +
          "GRAFT_UPDATE_STATE_LOCK=1 sbt 'testOnly graft.StateLockSpec' and commit:\n" +
          (drifted ++ removed.map(n => s"$n: in lockfile but no longer registered")).mkString("\n"))
    }
  }
}
