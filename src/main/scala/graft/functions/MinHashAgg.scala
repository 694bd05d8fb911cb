package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.functions.TextFns.{As, Bs, MinHashK, MinHashP}

/** MinHash signature as ONE `TypedImperativeAggregate`: the whole
  * k-permutation sketch lives in a single mutable `Array[Long]` buffer
  * per group instead of k separate `min(perm_i(h))` aggregate columns.
  *
  * Both forms are partial-aggregable (update locally, merge = elementwise
  * min), so both scale; the declarative form additionally gets
  * whole-stage codegen, which is why [[graft.operators.Dedup]] q35 keeps
  * it at k=16. This aggregate is the shape that wins when k grows
  * (128-256 permutations): k aggregate expressions bloat the generated
  * code past JIT limits and widen every shuffle row descriptor, while a
  * sketch buffer stays one opaque binary column and its update loop is
  * one tight JVM method. Same trade Spark itself makes for HLL++
  * (`approx_count_distinct` is a `TypedImperativeAggregate`).
  *
  * `MinHashSigSpec` pins exact equality with q35's declarative
  * signatures on the real corpus.
  */
case class MinHashSignature(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects a bigint word-hash column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(MinHashK)(Long.MaxValue)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < MinHashK) {
        val p = (As(i) * h + Bs(i)) % MinHashP
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < MinHashK) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(MinHashK * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(MinHashK)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSignature =
    copy(child = newChildren.head)
}

object MinHashAgg {

  /** Column API: `graft_minhash(h)` → `array<bigint>` of length k. */
  def minhash(h: Column): Column = call_function("graft_minhash", h)
}
