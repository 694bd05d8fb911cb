package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains(value, bloom)` — Bloom-filter membership test
  * as a native codegen'd expression.
  *
  * `bloom` must be a FOLDABLE binary column (a `lit(...)` of the
  * serialized `org.apache.spark.util.sketch.BloomFilter`, the public
  * sketch `DataFrameStatFunctions.bloomFilter` builds): the filter is
  * deserialized ONCE per task via a codegen reference object, and the
  * per-row test is one `mightContainBinary` on the value's UTF-8 bytes
  * — byte-identical to what `put(String)` inserted on the build side.
  *
  * Why an expression and not a UDF: the membership test sits in scan
  * position (pre-join pruning of a micro-batch against a corpus
  * sketch), exactly where a black-box UDF would break whole-stage
  * codegen and filter pushdown context. This is the engine's version of
  * Spark's own internal runtime-filter `BloomFilterMightContain`,
  * surfaced as a user-callable function.
  *
  * Null value → null (standard propagation; a null key can't equi-join
  * either, so pre-filter semantics are unaffected). False positives at
  * the configured fpp; never false negatives: filtering a join's probe
  * side with it cannot change the join's result, only skip
  * definite-miss rows.
  */
case class BloomMightContain(value: Expression, bloom: Expression)
    extends BinaryExpression {

  override def left: Expression = value
  override def right: Expression = bloom

  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects a string value, got ${value.dataType.simpleString}")
    else if (bloom.dataType != BinaryType || !bloom.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_contains expects a foldable binary bloom-filter literal")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType

  @transient private lazy val filter: BloomFilter = {
    val bytes = bloom.eval().asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(v: Any, unused: Any): Any =
    filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = $bloomRef.mightContainBinary($v.getBytes());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(value = newLeft, bloom = newRight)
  override def prettyName: String = "graft_bloom_contains"
}

object BloomExprs {

  /** Serialize a built sketch for shipping inside a plan literal. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Column API: membership of `value` in a serialized bloom filter. */
  def mightContain(value: Column, bloomBytes: Array[Byte]): Column =
    call_function("graft_bloom_contains", value, lit(bloomBytes))
}
