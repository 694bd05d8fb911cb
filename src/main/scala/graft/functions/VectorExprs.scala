package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact int64 dot product of two `array<bigint>` columns as a native
  * Catalyst expression with whole-stage codegen.
  *
  * The composable formulation —
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0L, (acc, v) => acc+v)` —
  * allocates an intermediate array per row and evaluates its lambdas
  * interpretively (higher-order-function lambdas don't participate in
  * codegen), and it sits in the hot loop of every similarity query. This
  * expression generates one fused loop: no allocation, no virtual calls,
  * inside the enclosing WholeStageCodegen span.
  *
  * Null semantics: null array → null (standard binary-expression null
  * propagation). Elements are read with `getLong` — the engine only
  * feeds it `transform`-produced arrays with `containsNull=false`.
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<bigint>, array<bigint>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {

  /** Column API for [[LongDotProduct]] via the registered `graft_dot`
    * function — call [[ensureRegistered]] on the session first (the
    * engine's query entry points do). */
  def dotL(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Idempotent per-session registration; sessions built with
    * `spark.sql.extensions=graft.plans.GraftExtensions` already have it. */
  def ensureRegistered(spark: SparkSession): Unit =
    graft.plans.GraftExtensions.register(spark)
}
