package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** `graft_topk(ord, value, k)` — the `k` values with the largest `ord`,
  * best first, as ONE hash-aggregable imperative aggregate.
  *
  * Why this exists: "top-k per key" is almost always written as a
  * `row_number()` window + `filter(rn <= k)` (q07's shape). That plan
  * shuffles EVERY input row to its key's partition and then SORTS the
  * full partition — at 100 TB the sort dominates and the shuffle carries
  * the whole table even though only k rows per key survive. This
  * aggregate is the rank-pruned form: a bounded k-element min-heap per
  * group under ObjectHashAggregate, partial-aggregable — the map side
  * collapses each group to ≤ k candidates BEFORE the shuffle, so at most
  * `k × groups` rows cross the wire regardless of input size, and no
  * sort of the input ever happens (only the k-element buffer is sorted
  * at eval, `k log k` per group). Same posture as [[ArgMax]] (which is
  * the k = 1 case) — see that scaladoc for why declarative `max_by`-style
  * forms fall to SortAggregate on struct payloads.
  *
  * Determinism: ties on `ord` are arbitrary (heap order is not
  * FIFO) — callers must make `ord` unique per group, exactly the
  * window-function discipline (q07 orders by `(price DESC, key ASC)`;
  * the aggregate form takes `struct(price, -key)`). NULL `ord` rows are
  * ignored; an empty/all-NULL group yields an empty array (not NULL —
  * the group existed).
  *
  * The heap compares with the interpreted ordering (log k comparisons
  * per row); the hot arithmetic producing `ord` stays in codegen
  * upstream.
  */
case class TopK(
    ord: Expression,
    value: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopK.Buf] {

  require(k >= 1, s"graft_topk k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(ord, value)

  override def checkInputDataTypes(): TypeCheckResult =
    if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(ord.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk ordering key type ${ord.dataType.simpleString} is not orderable")

  override def dataType: DataType = ArrayType(value.dataType, containsNull = true)
  override def nullable: Boolean = false

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(ord.dataType)
  // One row per kept pair — (ord, value) — length-prefixed on the wire.
  @transient private lazy val projection =
    UnsafeProjection.create(Array(ord.dataType, value.dataType))

  override def createAggregationBuffer(): TopK.Buf = new TopK.Buf(ordering)

  override def update(buf: TopK.Buf, row: InternalRow): TopK.Buf = {
    val o = ord.eval(row)
    if (o != null && buf.admits(o, k)) {
      // eval may return buffer-backed mutable values — copy before keeping.
      buf.offer(InternalRow.copyValue(o), InternalRow.copyValue(value.eval(row)), k)
    }
    buf
  }

  override def merge(a: TopK.Buf, b: TopK.Buf): TopK.Buf = {
    b.foreachPair { (o, v) => if (a.admits(o, k)) a.offer(o, v, k) }
    a
  }

  override def eval(buf: TopK.Buf): Any =
    new GenericArrayData(buf.sortedValuesDesc)

  override def serialize(buf: TopK.Buf): Array[Byte] = {
    val rows = mutable.ArrayBuffer.empty[Array[Byte]]
    buf.foreachPair { (o, v) => rows += projection.apply(InternalRow(o, v)).getBytes }
    val total = 4 + rows.iterator.map(4 + _.length).sum
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(rows.length)
    rows.foreach { r => bb.putInt(r.length); bb.put(r) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopK.Buf = {
    val buf = new TopK.Buf(ordering)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      val row = new UnsafeRow(2)
      row.pointTo(arr, len)
      buf.offer(InternalRow.copyValue(row.get(0, ord.dataType)),
        InternalRow.copyValue(row.get(1, value.dataType)), k)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopK =
    copy(ord = newChildren(0), value = newChildren(1))
  override def prettyName: String = "graft_topk"
}

object TopK {
  /** Bounded min-heap of (ord, value): the root is the WORST kept pair,
    * so admission is one comparison and eviction is O(log k). */
  final class Buf(ordering: Ordering[Any]) {
    // PriorityQueue dequeues the max of its ordering — reverse it so
    // dequeue yields the smallest ord (the eviction candidate).
    private val heap =
      mutable.PriorityQueue.empty[(Any, Any)](Ordering.by[(Any, Any), Any](_._1)(ordering).reverse)

    /** Would `o` enter a k-bounded buffer? (Avoids copying the value of
      * rows that lose immediately — the common case on big groups.) */
    def admits(o: Any, k: Int): Boolean =
      heap.size < k || ordering.compare(o, heap.head._1) > 0

    def offer(o: Any, v: Any, k: Int): Unit = {
      heap.enqueue((o, v))
      if (heap.size > k) heap.dequeue()
    }

    def foreachPair(f: (Any, Any) => Unit): Unit =
      heap.foreach { case (o, v) => f(o, v) }

    /** Kept values, best ord first. */
    def sortedValuesDesc: Array[Any] =
      heap.toArray.sortWith((a, b) => ordering.compare(a._1, b._1) > 0).map(_._2)
  }
}

object TopKAgg {
  /** Column API: `graft_topk(ord, value, k)` → array of the `value`s of
    * the k greatest-`ord` rows, best first (ties: arbitrary — make `ord`
    * unique per group, e.g. `struct(score, -id)`). Self-registering:
    * `call_function` resolves through the ACTIVE session's function
    * registry, which a bare `newSession()` (no GraftExtensions) starts
    * empty — every call site registering by hand proved forgettable
    * (the whole-surface plan census caught two misses). */
  def topK(ord: Column, value: Column, k: Int): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(VectorExprs.ensureRegistered)
    call_function("graft_topk", ord, value, lit(k))
  }
}
