package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
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

/** Total 8-bit scalar-quantization reconstruction error of one fixed-point
  * vector against broadcast per-dimension stats, as a native codegen'd
  * Catalyst expression:
  *
  * {{{
  *   err(sv, mins, rngs) = Σ_i | d_i - ⌊(⌊d_i·255 / r_i⌋ · r_i) / 255⌋ |
  *   where d_i = sv[i] - mins[i], r_i = rngs[i]  (0 when r_i = 0)
  * }}}
  *
  * i.e. quantize `q = ⌊d·255/r⌋`, reconstruct `d' = ⌊q·r/255⌋`, sum the
  * absolute per-dimension errors. All inputs are non-negative by
  * construction (`mins` is the per-dimension minimum), so Java's `/` IS
  * floor division and the arithmetic is exact int64.
  *
  * The composable formulation — `aggregate(transform(sequence(1, dim),
  * i -> …), …)` — materializes a 64-element array per row and evaluates
  * its lambdas interpretively (HOF lambdas don't participate in codegen);
  * it was q58's hot loop and the #2 bench cost. This expression fuses the
  * whole thing into one allocation-free loop inside WholeStageCodegen —
  * the same trade [[LongDotProduct]] makes for the similarity queries.
  *
  * Null semantics: any null input → null (standard ternary-expression
  * null propagation). Arrays are `transform`/`array`-produced with
  * `containsNull=false`, read via `getLong`.
  */
case class QuantizeError(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (children.forall(c => ok(c.dataType))) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_quant_err expects 3 array<bigint> arguments, got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(svAny: Any, minsAny: Any, rngsAny: Any): Any = {
    val sv = svAny.asInstanceOf[ArrayData]
    val mins = minsAny.asInstanceOf[ArrayData]
    val rngs = rngsAny.asInstanceOf[ArrayData]
    val n = math.min(sv.numElements(), math.min(mins.numElements(), rngs.numElements()))
    var acc = 0L
    var i = 0
    while (i < n) {
      val r = rngs.getLong(i)
      if (r != 0L) {
        val d = sv.getLong(i) - mins.getLong(i)
        val recon = (d * 255L / r) * r / 255L
        acc += math.abs(d - recon)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sv, mins, rngs) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val r = ctx.freshName("r")
      val d = ctx.freshName("d")
      val recon = ctx.freshName("recon")
      s"""
         |int $n = java.lang.Math.min($sv.numElements(),
         |  java.lang.Math.min($mins.numElements(), $rngs.numElements()));
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $r = $rngs.getLong($i);
         |  if ($r != 0L) {
         |    long $d = $sv.getLong($i) - $mins.getLong($i);
         |    long $recon = ($d * 255L / $r) * $r / 255L;
         |    $acc += java.lang.Math.abs($d - $recon);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): QuantizeError =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object VectorExprs {

  /** Column API for [[LongDotProduct]] via the registered `graft_dot`
    * function — call [[ensureRegistered]] on the session first (the
    * engine's query entry points do). */
  def dotL(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Column API for [[QuantizeError]] via the registered
    * `graft_quant_err` function. */
  def quantErr(sv: Column, mins: Column, rngs: Column): Column =
    call_function("graft_quant_err", sv, mins, rngs)

  /** Idempotent per-session registration; sessions built with
    * `spark.sql.extensions=graft.plans.GraftExtensions` already have it. */
  def ensureRegistered(spark: SparkSession): Unit =
    graft.plans.GraftExtensions.register(spark)
}
