package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q144's fusion must be the exact rank arithmetic it claims: a
  * hand-rolled reference (cosine leg → BM25-by-example leg → integer
  * RRF → top-5) reproduces every output row on a general corpus; a
  * planted doc that tops BOTH legs fuses at exactly 2·⌊10⁶/61⌋ with
  * both ranks 1; and a high-cosine doc sharing no query terms carries
  * r_lex = 0 — the single-leg attribution the report exists to show. */
class RrfFusionSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = Similarity.Dim
  private val NQ = 8
  private val K1 = TextAnalysis.Bm25K1
  private val B = TextAnalysis.Bm25B

  private def writeCorpus(dir: String, texts: Seq[String],
      vecs: Int => Int => Float): Unit = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "src0", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    texts.indices.map { i =>
      (i.toLong, (0 until Dim).map(j => vecs(i)(j)).toArray, i % 3)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
  }

  /** Reference RRF sharing nothing with the engine but the spec:
    * (q_id, doc_id) -> (r_sem, r_lex, rrf_u), top-5 per query. */
  private def reference(texts: Seq[String], vecs: Int => Int => Float)
      : Map[(Long, Long), (Long, Long, Long)] = {
    val n = texts.size
    def scaled(i: Int): Array[Long] =
      (0 until Dim).map(j => math.floor(vecs(i)(j).toDouble * 10000.0).toLong)
        .toArray
    def dot(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val toks = texts.map(_.split(" ").toSeq)
    val tf = toks.zipWithIndex.map { case (ws, i) =>
      i -> ws.groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    }.toMap
    val df = toks.flatMap(_.distinct).groupBy(identity)
      .map { case (w, o) => w -> o.size.toLong }
    val nDocs = n.toLong
    val avgdl = toks.map(_.size.toLong).sum.toDouble / nDocs
    val semRank: Map[Long, Seq[Long]] = (0 until NQ).map { q =>
      val sq = scaled(q)
      q.toLong -> (NQ until n).map { i =>
        val si = scaled(i)
        (i.toLong, dot(sq, si).toDouble /
          math.sqrt(dot(sq, sq).toDouble * dot(si, si).toDouble))
      }.sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
    }.toMap
    val lexRank: Map[Long, Seq[Long]] = (0 until NQ).map { q =>
      val qt = tf(q).keys.toSeq.map(w => (w, df(w)))
        .sortBy { case (w, d) => (d, w) }.take(3).map(_._1)
      val scoredDocs = (NQ until n).flatMap { i =>
        val s = qt.flatMap { w =>
          tf(i).get(w).map { t =>
            val idf = math.log((nDocs - df(w) + 0.5) / (df(w) + 0.5) + 1.0)
            val dl = toks(i).size.toDouble
            math.floor(1e6 * idf * (t * (K1 + 1.0)) /
              (t + K1 * (1.0 - B + B * dl / avgdl))).toLong
          }
        }
        if (s.isEmpty) None else Some((i.toLong, s.sum))
      }
      q.toLong -> scoredDocs.sortBy { case (id, s) => (-s, id) }
        .take(10).map(_._1)
    }.toMap
    def part(r: Long): Long = 1000000L / (60L + r)
    (0 until NQ).flatMap { q0 =>
      val q = q0.toLong
      val sems = semRank(q).zipWithIndex
        .map { case (id, i) => id -> (i + 1).toLong }.toMap
      val lexs = lexRank(q).zipWithIndex
        .map { case (id, i) => id -> (i + 1).toLong }.toMap
      (sems.keySet ++ lexs.keySet).toSeq.map { id =>
        val ru = sems.get(id).map(part).getOrElse(0L) +
          lexs.get(id).map(part).getOrElse(0L)
        (id, ru)
      }.sortBy { case (id, ru) => (-ru, id) }.take(5).map { case (id, ru) =>
        (q, id) -> ((sems.getOrElse(id, 0L), lexs.getOrElse(id, 0L), ru))
      }
    }.toMap
  }

  private def run(dir: String): Map[(Long, Long), (Long, Long, Long)] =
    SparkEntry.queries("q144_rrf_fusion")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("engine fusion equals the reference RRF pipeline row-for-row " +
      "on a general corpus") {
    val dir = Files.createTempDirectory("rrf_").toString
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel")
    val texts = (0 until 30).map(i =>
      (0 until 12 + i % 9)
        .map(j => vocab((i * 5 + j * 3) % 8) + (if (j % 4 == 0) s"r$i" else ""))
        .mkString(" "))
    val vals = (i: Int) => (j: Int) => (((i * 29 + j * 13) % 31) - 15) / 12.0f
    writeCorpus(dir, texts, vals)
    run(dir) shouldBe reference(texts, vals)
  }

  test("a doc topping BOTH legs fuses at 2*16393; a high-cosine doc " +
      "sharing no query terms carries r_lex = 0") {
    val dir = Files.createTempDirectory("rrf2_").toString
    // Query 0: text with unique rare terms; vector v0.
    // Doc 8: SAME text (tops lexical) and SAME vector (tops semantic).
    // Doc 9: same vector direction (high cosine) but disjoint common
    // terms shared with many docs (never in q0's rare-term postings).
    val filler = (10 until 30).map(i =>
      s"common words everywhere here plus x$i y$i z$i")
    val texts = Seq(
      "uniqa uniqb uniqc plus common words",          // q0
      "qone terms here common words everywhere",      // q1..q7: generic
      "qtwo terms here common words everywhere",
      "qthree terms here common words everywhere",
      "qfour terms here common words everywhere",
      "qfive terms here common words everywhere",
      "qsix terms here common words everywhere",
      "qseven terms here common words everywhere",
      "uniqa uniqb uniqc plus common words",          // doc 8: twin of q0
      "common words everywhere here plus nothing"     // doc 9: no rare terms
    ) ++ filler
    val base = (j: Int) => (((j * 7) % 19) - 9) / 10.0f
    val vals = (i: Int) => (j: Int) =>
      if (i == 0 || i == 8 || i == 9) base(j)           // q0 ≡ d8 ≡ d9
      else (((i * 29 + j * 13) % 31) - 15) / 12.0f
    writeCorpus(dir, texts, vals)
    val got = run(dir)
    // d8: cos = 1 ties with d9 — d8 wins the id tie-break; lexical twin
    // text ⇒ top BM25. Both ranks 1 ⇒ rrf = 2 * (10^6 / 61).
    got((0L, 8L)) shouldBe ((1L, 1L, 2L * 16393L))
    // d9: rank-2 semantic (same direction, later id), zero lexical.
    val (rs9, rl9, ru9) = got((0L, 9L))
    rs9 shouldBe 2L
    rl9 shouldBe 0L
    ru9 shouldBe 1000000L / 62L
  }
}
