package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Banded (bounded) Levenshtein distance: `min(levenshtein(a, b), k+1)`
  * computed in O(k·min(len)) instead of O(len²).
  *
  * The dedup verify stage ([[graft.operators.Dedup]] q54/q59) never needs
  * the exact distance of a far-apart pair — it needs "is the distance
  * within k", where k is the edit budget implied by the similarity
  * threshold (k ≈ (1-θ)·len). The classic Ukkonen band restricts the DP
  * to the 2k+1 diagonal and abandons a row whose band minimum already
  * exceeds k — for the typical REJECTED candidate this exits after ~k
  * rows, making exact verification affordable even with a 100 TB
  * candidate stream. Spark's built-in `levenshtein` (and its `threshold`
  * variant) computes the full matrix per pair; this is the engine's
  * native, codegen'd replacement.
  */
object EditDistance {

  /** `min(lev(a, b), k+1)`, banded with early exit. Called from both the
    * interpreted path and generated code (static forwarder).
    *
    * Operates on Unicode CODE POINTS, not UTF-16 code units: Spark's
    * `levenshtein` (q54's anchor) and DuckDB's (q59's oracle) both count
    * a supplementary-plane character as one symbol, so a surrogate pair
    * must cost one edit here too, or the parity silently breaks on the
    * first non-BMP corpus. */
  def within(ua: UTF8String, ub: UTF8String, k: Int): Int = {
    if (k < 0) return 0
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    val la = a.length
    val lb = b.length
    val inf = k + 1
    if (math.abs(la - lb) > k) return inf
    var prev = new Array[Int](lb + 1)
    var cur = new Array[Int](lb + 1)
    java.util.Arrays.fill(prev, inf)
    var j = 0
    while (j <= math.min(lb, k)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= la) {
      java.util.Arrays.fill(cur, inf)
      cur(0) = if (i <= k) i else inf
      val jLo = math.max(1, i - k)
      val jHi = math.min(lb, i + k)
      var rowMin = cur(0)
      j = jLo
      while (j <= jHi) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = cur(j - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin >= inf) return inf // early exit: whole band over budget
      val t = prev; prev = cur; cur = t
      i += 1
    }
    math.min(prev(lb), inf)
  }
}

/** `graft_edit_within(a, b, k)` — see [[EditDistance.within]]. */
case class BoundedEditDistance(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == StringType &&
      third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_edit_within expects (string, string, int), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any, k: Any): Any =
    EditDistance.within(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, k) =>
      s"${ev.value} = graft.functions.EditDistance.within($a, $b, $k);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BoundedEditDistance =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object TextExprs {

  /** Column API for [[BoundedEditDistance]] via the registered
    * `graft_edit_within` function. */
  def editWithin(a: Column, b: Column, k: Column): Column =
    call_function("graft_edit_within", a, b, k)

  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.plans.GraftExtensions.register(spark)
}
