package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, concat, lit}
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.functions.Parity.{md5u32, md5u32b}

/** STREAMING corpus-version monitor — the stateful twin of batch
  * q151's manifest. Per source the running (row count, character sum,
  * two-lane XOR content checksum) live in stream state, and every
  * micro-batch emits the source's updated manifest row — so "did feed
  * X change, and by how much, since the last blessed snapshot" is
  * answered continuously by diffing two 32-byte states, never by
  * re-scanning the corpus.
  *
  * The state fields are each commutative-monoid folds (+, +, ^, ^),
  * so after ANY micro-batch partitioning of the input the state is
  * bit-identical to batch q151 over everything seen — spec-pinned at
  * every boundary against an independent pure-JVM md5 replay. The
  * checksum hashes the (doc_id, text) PAIR with the same engine-
  * portable [[graft.functions.Parity.md5u32]]/[[graft.functions.Parity.md5u32b]]
  * lane pair as q151 (~2^-64 false-"unchanged" bound), so a stream
  * state and a batch manifest of the same corpus agree exactly, and
  * byte-identical duplicate docs cannot XOR-cancel.
  *
  * State is four int64 per source, forever; failure recovery rides
  * the checkpoint (state is versioned per batch, so a replayed batch
  * overwrites rather than re-folds — no double-XOR on restart). The
  * deliberately lean state omits q151's n_langs / id-range columns:
  * the change-detector essentials are the monoid four; a consumer
  * wanting the full manifest runs batch q151 on the flagged source.
  *
  * Scale posture: rows shuffle once, keyed by source, into the
  * stateful operator; snapshots are one row per source per batch. */
object ManifestStreams {

  final case class ManifestState(nDocs: Long, sumChars: Long,
      checksum: Long, checksumB: Long)

  final case class ManifestSnapshot(source: String, n_docs: Long,
      sum_chars: Long, checksum: Long, checksum_b: Long)

  /** Per-source manifest snapshots, updated every micro-batch (use
    * with `outputMode("update")`). `docs` needs (doc_id, text, source,
    * n_chars) — the documents-table shape. */
  def manifest(docs: DataFrame): Dataset[ManifestSnapshot] = {
    import docs.sparkSession.implicits._
    val key = concat(col("doc_id").cast("string"), lit(":"), col("text"))
    docs.select(col("source"), md5u32(key).as("h"), md5u32b(key).as("hb"),
        col("n_chars"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[ManifestState, ManifestSnapshot](
        GroupStateTimeout.NoTimeout()) { (src, rows, state) =>
        var s = state.getOption.getOrElse(ManifestState(0L, 0L, 0L, 0L))
        rows.foreach { case (_, h, hb, nc) =>
          s = ManifestState(s.nDocs + 1L, s.sumChars + nc,
            s.checksum ^ h, s.checksumB ^ hb)
        }
        state.update(s)
        ManifestSnapshot(src, s.nDocs, s.sumChars, s.checksum, s.checksumB)
      }
  }
}
