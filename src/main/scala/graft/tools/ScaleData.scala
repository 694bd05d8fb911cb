package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Deterministic synthetic-data generator for scale evidence beyond the
  * driver's sf0.1 cap (round-3 verdict task 4): a ~10× `documents` +
  * `embeddings` set (~sf1) with the same schema, vocabulary style, and
  * planted-duplicate structure as `/root/testdata` (TESTDATA.md), plus a
  * skewed variant with a viral-duplicate hot bucket for the salting
  * wall-clock experiment.
  *
  * Determinism: every row is a pure function of its id (a per-row
  * `java.util.Random` seeded from the id) — regenerating into the same
  * path yields byte-identical content, and generation parallelizes
  * embarrassingly (`spark.range` → map, no cross-row state).
  */
object ScaleData {

  final case class DocRow(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)
  final case class EmbRow(vec_id: Long, embedding: Seq[Float], label: Int)

  private val Vocab: IndexedSeq[String] = Vector(
    "spark", "batch", "part", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "join", "shuffle", "cache", "disk",
    "memory", "task", "stage", "executor", "driver", "plan", "code", "row",
    "table", "index", "merge", "skew", "broadcast", "bucket", "range",
    "stream")
  private val Langs = Vector("en", "de", "es", "fr", "zh")

  /** Base text for a doc id: 30-70 vocab words, seeded by the id. */
  private def baseText(id: Long): String = {
    val r = new java.util.Random(id * 2654435761L + 13)
    val n = 30 + r.nextInt(41)
    (0 until n).map(_ => Vocab(r.nextInt(Vocab.size))).mkString(" ")
  }

  /** Doc text with the testdata-style planted duplicates: ~2% exact
    * copies of a neighbor, ~2% near copies (last word changed). */
  private def docText(id: Long): String = (id % 50) match {
    case 1 if id > 0 => baseText(id - 1) // exact dup of neighbor
    case 3 if id > 1 => // near dup: swap the final word
      val w = baseText(id - 2).split(' ')
      (w.dropRight(1) :+ "variant").mkString(" ")
    case _ => baseText(id)
  }

  private def docRow(id: Long): DocRow = {
    val r = new java.util.Random(id * 40503L + 7)
    val text = docText(id)
    DocRow(id, text, Langs(r.nextInt(Langs.size)), s"src${r.nextInt(20)}",
      text.length.toLong)
  }

  private val Dim = graft.operators.Similarity.Dim
  private val NLabels = 10

  /** Label centroid, seeded by label only. */
  private def centroid(label: Int): Array[Double] = {
    val r = new java.util.Random(1000L + label)
    Array.fill(Dim)(r.nextDouble() * 2 - 1)
  }

  private def baseVec(id: Long, label: Int): Array[Float] = {
    val c = centroid(label)
    val r = new java.util.Random(id * 6364136223846793005L + 1442695040888963407L)
    Array.tabulate(Dim)(d => (c(d) * 0.8 + (r.nextDouble() * 2 - 1) * 0.4).toFloat)
  }

  private def embRow(id: Long): EmbRow = {
    val label = new java.util.Random(id * 31L + 7).nextInt(NLabels)
    if (id % 100 == 7 && id > 0) {
      // planted embedding near-dup: previous vector + tiny jitter
      val prev = embRow(id - 1)
      val r = new java.util.Random(id * 97L + 3)
      EmbRow(id, prev.embedding.map(v => v + (r.nextDouble() * 0.002 - 0.001).toFloat),
        prev.label)
    } else EmbRow(id, baseVec(id, label).toSeq, label)
  }

  /** Generate `documents.parquet` + `embeddings.parquet` under `dir`. */
  def generate(spark: SparkSession, dir: String, nDocs: Long,
      nEmb: Long): Unit = {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    spark.range(0, nDocs, 1, par).as[Long].map(docRow _)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    spark.range(0, nEmb, 1, par).as[Long].map(embRow _)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
  }

  /** Skewed documents table: `nBase` distinct docs plus `hotCopies` EXACT
    * copies of one viral document (ids from 10_000_000) — every copy
    * lands in the same four LSH band buckets, concentrating
    * m(m-1)/2 candidate pairs on single join keys unless salted. */
  def generateHot(spark: SparkSession, dir: String, nBase: Long,
      hotCopies: Long): Unit = {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val base = spark.range(0, nBase, 1, par).as[Long].map(docRow _)
    val hot = spark.range(10000000L, 10000000L + hotCopies, 1, par).as[Long]
      .map(id => docRow(id).copy(doc_id = id, text = baseText(424242L)))
      .map(d => d.copy(n_chars = d.text.length.toLong))
    base.union(hot)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
  }
}
