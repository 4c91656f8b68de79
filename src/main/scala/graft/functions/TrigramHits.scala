package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static trigram scan shared by interpreted eval and generated code:
  * count the positions whose 3-char window (code-point based, matching
  * Spark `substr` / DuckDB `substr` semantics) is in the profile set.
  * One pass over the string — the builtin formulation
  * (`filter(transform(sequence(...), i -> substr(txt,i,3)), isin(...))`)
  * is interpreted per trigram AND allocates the full trigram array per
  * row.
  */
object TrigramUtil {
  def count(s: UTF8String, set: java.util.HashSet[UTF8String]): Int = {
    val n = s.numChars()
    var c = 0
    var i = 1
    while (i <= n - 2) {
      if (set.contains(s.substringSQL(i, 3))) c += 1
      i += 1
    }
    c
  }
}

object TrigramHits {
  /** Separator joining profile trigrams into the foldable literal the
    * expression receives — U+0001, a byte no document trigram contains
    * (named once here; an invisible raw byte embedded in string
    * literals across call sites is unreviewable).
    */
  val ProfileSep = "\u0001"
}

/** `trigram_hits(text, profile) -> int`: occurrences of any profile
  * trigram in `text`, where `profile` is a foldable string literal of
  * trigrams joined by [[TrigramHits.ProfileSep]] (the n-gram
  * language-ID profile). Null-intolerant.
  */
case class TrigramHits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "trigram_hits"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, foldable string profile)")
    }

  /** The profile set, built once per expression instance. */
  @transient private lazy val profile: java.util.HashSet[UTF8String] = {
    val set = new java.util.HashSet[UTF8String]()
    right.eval(null).asInstanceOf[UTF8String].toString
      .split(TrigramHits.ProfileSep.charAt(0)).foreach(t => set.add(UTF8String.fromString(t)))
    set
  }

  override protected def nullSafeEval(text: Any, prof: Any): Any =
    TrigramUtil.count(text.asInstanceOf[UTF8String], profile)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("trigramProfile", profile,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, (text, _) =>
      s"${ev.value} = graft.functions.TrigramUtil.count($text, $setRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TrigramHits =
    copy(left = newLeft, right = newRight)
}
