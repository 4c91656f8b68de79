package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Locks the README's suite/test counts to the tree (the round-16
  * verdict's drift finding: README said 36/256 while the tree ran
  * 37/259). `tools/counts.sh` is the writer; this spec is the gate —
  * if a suite or test is added without re-running the script,
  * `sbt test` fails here instead of shipping a stale README.
  */
class CountsSpec extends AnyFunSuite {

  /** SHARES tools/counts.sh's rules by reading the same pattern file
    * (tools/counts_rules.txt, line 1 = suite declaration, line 2 =
    * test opener — syntax valid in both POSIX ERE and java.util.regex;
    * the r17 ADVICE single-sourcing): suites = `class X extends
    * AnyFunSuite|SparkSpecBase` declarations (a file can hold two);
    * tests = non-comment `test(` openers (ScalaCheck `Properties`
    * objects register under a different framework and are excluded
    * from the scalatest totals the README quotes; env-gated tests
    * that assume-cancel still count — sbt reports them as canceled,
    * so its "run" total is succeeded+failed+canceled). Per-round the
    * real sbt summary is cross-checked via
    * `tools/counts.sh --check-summary <sbt-test-log>`.
    */
  private def treeCounts(): (Int, Int) = {
    val dir = Paths.get("src/test/scala/graft")
    val files = Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".scala")).toSeq
    val rules = Files.readAllLines(Paths.get("tools/counts_rules.txt")).asScala
    assert(rules.size >= 2, "tools/counts_rules.txt must hold the two patterns")
    val suiteDecl = (rules(0) + ".*").r
    val opener = (rules(1) + ".*").r
    val (suites, tests) = files.map { p =>
      val lines = Files.readAllLines(p).asScala
      (lines.count(suiteDecl.matches(_)), lines.count(opener.matches(_)))
    }.foldLeft((0, 0)) { case ((s, t), (ds, dt)) => (s + ds, t + dt) }
    (suites, tests)
  }

  test("README suite/test counts match the tree (tools/counts.sh is the writer)") {
    val (suites, tests) = treeCounts()
    val readme = Files.readString(Paths.get("README.md"))
    val layout = """(\d+) suites / (\d+) scalatest tests""".r
      .findFirstMatchIn(readme)
      .getOrElse(fail("README lost its 'N suites / M scalatest tests' line"))
    val cmd = """# (\d+) suites, (\d+) tests""".r
      .findFirstMatchIn(readme)
      .getOrElse(fail("README lost its '# N suites, M tests' command comment"))
    assert(layout.group(1).toInt === suites && layout.group(2).toInt === tests,
      s"README layout line says ${layout.matched}; tree has $suites/$tests — run tools/counts.sh")
    assert(cmd.group(1).toInt === suites && cmd.group(2).toInt === tests,
      s"README commands block says ${cmd.matched}; tree has $suites/$tests — run tools/counts.sh")
  }
}
