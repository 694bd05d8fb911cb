package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** BPE training is pinned three ways: the classic Sennrich
  * low/lower/newest/widest fixture's first five merges are
  * hand-computed (including both deterministic tie-breaks), the
  * distributed trainer must equal an INDEPENDENT driver-side replica
  * on a denser fixture, and serving must replay training exactly
  * (tokenizing the training words reproduces the merged symbols).
  * The loop's driver-action budget is pinned kmeansAuto-style. */
class BpeSpec extends AnyFunSuite with SparkSpec with Matchers {

  import Bpe.Merge

  private def docsOf(wordCounts: (String, Int)*) = {
    import spark.implicits._
    wordCounts.zipWithIndex.map { case ((w, n), i) =>
      (i.toLong, Seq.fill(n)(w).mkString(" "), "en", "s0", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Independent pure-Scala weighted BPE trainer: same argmax rule
    * (count desc, then (a, b) lexicographic), same left-to-right
    * non-overlapping pass — but counted with plain Maps, no Spark. */
  private def referenceTrain(wordCounts: Map[String, Long],
      nMerges: Int): Seq[Merge] = {
    var vocab: Map[Vector[String], Long] = wordCounts.map {
      case (w, n) => w.map(_.toString).toVector -> n
    }
    val merges = Seq.newBuilder[Merge]
    var r = 0
    var go = true
    while (go && r < nMerges) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          pc((p(0), p(1))) = pc.getOrElse((p(0), p(1)), 0L) + n
        }
      }
      if (pc.isEmpty) go = false
      else {
        val (l, rr) = pc.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head._1
        r += 1
        merges += Merge(r, l, rr)
        vocab = vocab.groupBy { case (syms, _) =>
          Bpe.mergeOnce(syms, l, rr)
        }.map { case (syms, g) => syms -> g.values.sum }
      }
    }
    merges.result()
  }

  test("the classic fixture's first five merges, ties included") {
    val docs = docsOf("low" -> 5, "lower" -> 2, "newest" -> 6,
      "widest" -> 3)
    val model = Bpe.train(docs, nMerges = 5)
    model.merges shouldBe Seq(
      Merge(1, "e", "s"),   // es 9 ties st 9 — (e,s) lex-first
      Merge(2, "es", "t"),  // est 9
      Merge(3, "l", "o"),   // lo 7 ties ow 7 — (l,o) lex-first
      Merge(4, "lo", "w"),  // low 7
      Merge(5, "e", "w"))   // 6-way tie ew/ne/west — (e,w) lex-first
  }

  test("distributed trainer equals the independent driver replica") {
    val counts = Map("abab" -> 7L, "abc" -> 4L, "bcbc" -> 5L,
      "cab" -> 3L, "aa" -> 2L, "b" -> 9L)
    val docs = docsOf(counts.toSeq.sortBy(_._1)
      .map { case (w, n) => w -> n.toInt }: _*)
    Bpe.train(docs, nMerges = 6).merges shouldBe
      referenceTrain(counts, nMerges = 6)
  }

  test("the shippable merge table carries the ranked merges verbatim") {
    val docs = docsOf("low" -> 5, "lower" -> 2, "newest" -> 6,
      "widest" -> 3)
    val rows = Bpe.mergeTable(docs, nMerges = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3)))
    rows shouldBe Array((1, "e", "s", "es"), (2, "es", "t", "est"),
      (3, "l", "o", "lo"))
  }

  test("serving replays training: tokenize reproduces the merged " +
      "symbols and the hand-pinned counts") {
    val docs = docsOf("low" -> 5, "lower" -> 2, "newest" -> 6,
      "widest" -> 3)
    val model = Bpe.train(docs, nMerges = 4)
    Bpe.applyMerges("low", model.merges) shouldBe Vector("low")
    Bpe.applyMerges("lower", model.merges) shouldBe
      Vector("low", "e", "r")
    Bpe.applyMerges("newest", model.merges) shouldBe
      Vector("n", "e", "w", "est")
    Bpe.applyMerges("widest", model.merges) shouldBe
      Vector("w", "i", "d", "est")

    import spark.implicits._
    val fresh = Seq((42L, "low lower newest widest", "en", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Bpe.countTokens(fresh, model.merges).collect()
    got.map(r => (r.getLong(0), r.getLong(1))) shouldBe
      Array((42L, (1 + 3 + 4 + 4).toLong))
  }

  test("NULL text tokenizes to zero tokens — serving matches training's " +
      "null tolerance (tokens() + explode drops nulls silently)") {
    import spark.implicits._
    val model = Bpe.train(docsOf("low" -> 3, "lower" -> 2), nMerges = 2)
    val dirty = Seq((1L, "low low", "en", "s0", 0L),
        (2L, null.asInstanceOf[String], "en", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Bpe.countTokens(dirty, model.merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    got(1) shouldBe ((2L, 0L)) // no NPE, zero tokens
    got(0)._2 should be > 0L
  }

  test("astral-plane characters are one symbol on both sides: train " +
      "and serve split by codepoint, not UTF-16 char") {
    Bpe.applyMerges("a😀b", Nil) shouldBe
      Vector("a", "😀", "b") // a 😀 b — emoji stays whole
    // training over the emoji word must produce merges serving can
    // replay: with 2 merges the whole 3-symbol word fuses.
    val docs = docsOf("a😀b" -> 5)
    val model = Bpe.train(docs, nMerges = 2)
    model.rounds shouldBe 2
    Bpe.applyMerges("a😀b", model.merges) shouldBe
      Vector("a😀b")
  }

  test("a pairless vocabulary stops before the first merge") {
    val model = Bpe.train(docsOf("a" -> 2, "b" -> 1), nMerges = 5)
    model.rounds shouldBe 0
    model.merges shouldBe empty
  }

  test("q131 composes with the trained vocabulary: vocab.source=bpe " +
      "audits coverage of Bpe's own merges, pinned by an independent " +
      "driver-side replay") {
    import graft.{SparkEntry, SparkSpec, Tables}
    val dir = SparkSpec.Sf0001
    val nMerges = 24
    spark.conf.set(Features.VocabSourceConf, "bpe")
    spark.conf.set(Features.BpeMergesConf, nMerges.toString)
    try {
      val audited = SparkEntry.queries("q131_vocab_coverage")(spark, dir)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap

      // Independent replay: train the SAME merges, then recompute each
      // source's in-vocab token mass in plain Scala over the corpus —
      // a word is covered iff some merge assembles it whole or it is
      // a single-codepoint seed.
      val model = Bpe.train(Tables.documents(spark, dir), nMerges)
      model.rounds shouldBe nMerges
      val merged = model.merges.map(m => m.left + m.right).toSet
      import spark.implicits._
      val expected = Tables.documents(spark, dir)
        .select("source", "text").as[(String, String)].collect()
        // split(" ", -1): Spark's split() keeps trailing empties and
        // sourceTokenCounts applies no nonEmpty filter — replay both.
        .flatMap { case (src, t) => t.split(" ", -1).map(src -> _) }
        .groupBy(_._1)
        .map { case (src, ws) =>
          val toks = ws.map(_._2)
          src -> ((toks.length.toLong,
            toks.count(w =>
              merged(w) || w.codePointCount(0, w.length) == 1).toLong))
        }
      audited shouldBe expected
      // the trained-vocab audit is non-trivial on this corpus: some
      // mass is covered, some is OOV
      val (tot, in) = audited.values.unzip
      in.sum should be > 0L
      in.sum should be < tot.sum
    } finally {
      spark.conf.unset(Features.VocabSourceConf)
      spark.conf.unset(Features.BpeMergesConf)
      Features.clear(spark) // drop the memoized bpeVocab artifact
    }
  }

  test("one driver action per round plus one leaf cut (kmeansAuto's " +
      "budget): 1 + 2*rounds SQL executions") {
    val docs = docsOf("low" -> 5, "lower" -> 2, "newest" -> 6,
      "widest" -> 3).localCheckpoint(true) // outside the window
    val (model, nActions) =
      graft.SqlActionCounter.countedSqlExecutions(spark) {
        Bpe.train(docs, nMerges = 4)
      }
    model.rounds shouldBe 4
    // seed vocab checkpoint + per round (argmax action + leaf cut)
    nActions shouldBe (1 + 2 * model.rounds)
  }
}
