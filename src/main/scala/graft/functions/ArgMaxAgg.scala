package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.DataType

/** `graft_argmax(ord, value)` — the value whose `ord` is largest, as ONE
  * hash-aggregable imperative aggregate.
  *
  * Why not `max_by` / `min(struct(...))`: those are DECLARATIVE
  * aggregates, and when `ord` or `value` is a struct (or contains an
  * array) their buffer types aren't mutable-buffer-compatible, so Spark
  * plans a SortAggregate — the whole input gets sorted per group key,
  * exactly the cost an "argmax instead of row_number window" rewrite is
  * trying to remove (observed on q44: the min-over-struct form planned
  * SortAggregate + Sort, no faster than the window it replaced). A
  * `TypedImperativeAggregate` runs under ObjectHashAggregate: hash-based,
  * no sort, and partial-aggregable — with a grouped fan-out input (q44's
  * n×10 vector×centroid cross) the map side collapses each group to one
  * buffer before the shuffle, so 10× fewer rows (and no wide payload
  * duplication) cross the wire vs a window over the same input.
  *
  * Determinism: ties on `ord` keep the FIRST-seen candidate, which is
  * order-dependent — callers must make `ord` unique per group (q44 uses
  * `struct(ccos, -c_label)`: cosine desc, then label asc, unique because
  * each centroid appears once per vector). `ord` rows with NULL are
  * ignored; an all-NULL/empty group yields NULL.
  *
  * Struct `ord` comparison uses the interpreted ordering (few
  * comparisons per row — 10 for q44's codebook); the hot arithmetic
  * (the cosine itself) stays in codegen upstream.
  */
case class ArgMax(
    ord: Expression,
    value: Expression,
    findMax: Boolean = true,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArgMax.Buf] {

  override def children: Seq[Expression] = Seq(ord, value)

  override def checkInputDataTypes(): TypeCheckResult =
    if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(ord.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_argmax ordering key type ${ord.dataType.simpleString} is not orderable")

  override def dataType: DataType = value.dataType
  override def nullable: Boolean = true

  // compare(a, b) > 0 ⇔ a beats b: plain ordering for argmax, reversed
  // for argmin (`graft_argmin` — timestamps etc. have no negation).
  @transient private lazy val ordering: Ordering[Any] = {
    val base = TypeUtils.getInterpretedOrdering(ord.dataType)
    if (findMax) base else base.reverse
  }
  @transient private lazy val projection =
    UnsafeProjection.create(Array(ord.dataType, value.dataType))

  override def createAggregationBuffer(): ArgMax.Buf = new ArgMax.Buf

  override def update(buf: ArgMax.Buf, row: InternalRow): ArgMax.Buf = {
    val o = ord.eval(row)
    if (o != null && (buf.isEmpty || ordering.compare(o, buf.ord) > 0)) {
      // eval may return buffer-backed mutable values — copy before keeping.
      buf.set(InternalRow.copyValue(o), InternalRow.copyValue(value.eval(row)))
    }
    buf
  }

  override def merge(a: ArgMax.Buf, b: ArgMax.Buf): ArgMax.Buf = {
    if (!b.isEmpty && (a.isEmpty || ordering.compare(b.ord, a.ord) > 0))
      a.set(b.ord, b.value)
    a
  }

  override def eval(buf: ArgMax.Buf): Any = if (buf.isEmpty) null else buf.value

  override def serialize(buf: ArgMax.Buf): Array[Byte] =
    if (buf.isEmpty) Array.emptyByteArray
    else projection.apply(InternalRow(buf.ord, buf.value)).getBytes

  override def deserialize(bytes: Array[Byte]): ArgMax.Buf = {
    val buf = new ArgMax.Buf
    if (bytes.nonEmpty) {
      val row = new UnsafeRow(2)
      row.pointTo(bytes, bytes.length)
      buf.set(InternalRow.copyValue(row.get(0, ord.dataType)),
        InternalRow.copyValue(row.get(1, value.dataType)))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArgMax =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArgMax =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArgMax =
    copy(ord = newChildren(0), value = newChildren(1))
  override def prettyName: String = if (findMax) "graft_argmax" else "graft_argmin"
}

object ArgMax {
  /** Mutable (ord, value) pair; `ord == null` marks the empty buffer. */
  final class Buf {
    var ord: Any = null
    var value: Any = null
    def isEmpty: Boolean = ord == null
    def set(o: Any, v: Any): Unit = { ord = o; value = v }
  }
}

object ArgMaxAgg {
  /** Column API: `graft_argmax(ord, value)` → the `value` of the row
    * with the greatest `ord` (ties: first seen — make `ord` unique).
    * Self-registering — see [[TopKAgg.topK]]'s note. */
  def argMax(ord: Column, value: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(VectorExprs.ensureRegistered)
    call_function("graft_argmax", ord, value)
  }

  /** `graft_argmin(ord, value)` — smallest `ord` wins. A separate
    * function (not `argMax(negate(ord))`) because ordering keys like
    * timestamps and strings have no negation. */
  def argMin(ord: Column, value: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(VectorExprs.ensureRegistered)
    call_function("graft_argmin", ord, value)
  }
}
