package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_heavy_hitters(item, k)` — MISRA–GRIES heavy-hitter summary as
  * a hash-aggregable imperative aggregate: at most `k − 1` counters per
  * group, any item whose true frequency exceeds `n / k` (n = group
  * size) is GUARANTEED to be among the returned candidates, and every
  * counter under-counts by at most `n / k`.
  *
  * This is the sketch family's frequency member (q51 does distinct
  * counts via HLL, q90 quantiles via percentile_approx — Spark has no
  * bounded-memory frequent-items aggregate that partial-aggregates
  * under ObjectHashAggregate, and `stat.freqItems` is a DataFrame-level
  * single-column pass, not a `groupBy` aggregate). The MERGE follows
  * Agarwal et al., "Mergeable Summaries" (PODS'12): sum counters
  * pairwise, then subtract the k-th largest combined count and drop
  * non-positive entries — the error bound composes across partials, so
  * map-side combine is safe and the shuffle carries ≤ k − 1 counters
  * per group instead of the group's vocabulary.
  *
  * Candidate SETS are stream-order-dependent at the margin (an item
  * near the n/k boundary may or may not survive a particular merge
  * order) — callers wanting deterministic output exact-verify the
  * candidates and filter to true φ-heavy items (the q99 two-pass
  * shape), for which the guarantee makes the result order-independent.
  * The returned array is sorted lexicographically.
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHitters.Buf] {

  require(k >= 2, s"graft_heavy_hitters needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_heavy_hitters item type must be STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): HeavyHitters.Buf =
    new HeavyHitters.Buf(k)

  override def update(buf: HeavyHitters.Buf, row: InternalRow): HeavyHitters.Buf = {
    val v = child.eval(row)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: HeavyHitters.Buf, b: HeavyHitters.Buf): HeavyHitters.Buf = {
    a.mergeWith(b)
    a
  }

  override def eval(buf: HeavyHitters.Buf): Any =
    new GenericArrayData(
      buf.counts.keysIterator.toArray.sorted.map(UTF8String.fromString(_)))

  override def serialize(buf: HeavyHitters.Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (s, c) => out.writeUTF(s); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): HeavyHitters.Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new HeavyHitters.Buf(k)
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.counts.put(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren(0))
  override def prettyName: String = "graft_heavy_hitters"
}

object HeavyHitters {

  /** At most `k − 1` (item → lower-bound count) counters. */
  final class Buf(k: Int) {
    val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

    /** Classic Misra–Gries step: hit increments; a miss inserts while
      * capacity remains, else decrements EVERY counter (the arriving
      * item annihilates one occurrence of each tracked item and
      * itself), dropping zeros. */
    def add(s: String): Unit = counts.get(s) match {
      case Some(c) => counts.update(s, c + 1L)
      case None if counts.size < k - 1 => counts.update(s, 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace { (_, c) => c - 1L }
        counts.foreach { case (key, c) => if (c <= 0L) dead += key }
        dead.foreach(counts.remove)
    }

    /** Mergeable-summaries merge: pairwise counter sum, then subtract
      * the k-th largest combined count from every counter and drop
      * non-positive ones — at most k − 1 survive and the n/k error
      * bound composes. */
    def mergeWith(other: Buf): Unit = {
      other.counts.foreach { case (s, c) =>
        counts.update(s, counts.getOrElse(s, 0L) + c)
      }
      if (counts.size > k - 1) {
        val sorted = counts.values.toArray
        java.util.Arrays.sort(sorted)
        val d = sorted(sorted.length - k) // k-th largest
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace { (_, c) => c - d }
        counts.foreach { case (key, c) => if (c <= 0L) dead += key }
        dead.foreach(counts.remove)
      }
    }
  }

  /** Column API: `graft_heavy_hitters(item, k)` → sorted candidate
    * array (every item with frequency > n/k is guaranteed present). */
  def heavyHitters(item: Column, k: Int): Column =
    call_function("graft_heavy_hitters", item, lit(k))
}
