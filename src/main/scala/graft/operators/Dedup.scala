package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables
import graft.functions.Parity._
import graft.functions.TextFns._

/** Deduplication operators over `documents` — the full cascade: exact
  * and content-normalized fingerprints, MinHash+LSH / SimHash / n-gram
  * Jaccard candidate sketches, exact and banded edit-distance verify,
  * connected-component clustering, per-doc keep/canonical decisions, and
  * the incremental new-batch-vs-corpus variant.
  *
  * Driver-mandated training-data-pipeline extensions (BASELINE.json
  * north star "dedup"). All hashing is md5-derived so the DuckDB oracle
  * can replay every pipeline bit-for-bit (see
  * [[graft.functions.Parity.md5u32]]).
  *
  * Scale posture (100 TB): no O(n²) comparisons anywhere —
  *  - exact/content dedup is one hash-groupBy (shuffle on a uniform key);
  *  - MinHash signatures are ONE groupBy over exploded tokens (16 `min`
  *    aggregates, partial-aggregable map-side); candidate pairs come from
  *    the banded self-join (pairs only within equal band buckets);
  *  - SimHash pairs join only within equal 8-bit bands (pigeonhole:
  *    hamming ≤ 3 ⇒ some band equal), never all-pairs;
  *  - n-gram Jaccard uses an inverted-index join on rare-ish shingles.
  * Skewed buckets (a virally-duplicated doc) are the known hazard: AQE
  * skew-join handles moderate skew; beyond that, band-bucket SALTING —
  * implemented in [[saltedSelfPairs]] and enabled via the session conf
  * `spark.graft.dedup.saltBuckets` (grid size S; default off). See
  * `DedupSaltingSpec` for the planted-hot-bucket evidence.
  */
object Dedup {

  type Q = (SparkSession, String) => DataFrame

  /** Session conf for band-bucket salting of the q35/q36 candidate
    * self-joins: the salt grid size S (>1 enables). Off by default —
    * salting replicates each banded row S×, which only pays for itself
    * when a bucket is pathologically hot. */
  val SaltBucketsConf = "spark.graft.dedup.saltBuckets"

  private def saltBuckets(spark: SparkSession): Int =
    spark.conf.getOption(SaltBucketsConf).map(_.trim.toInt).filter(_ > 1).getOrElse(1)

  /** All intra-bucket candidate pairs (`x_doc_id < y_doc_id`) of a banded
    * table, self-joined on `keyCols` — optionally SALTED against hot
    * buckets (the viral-duplicate hazard: one doc duplicated 10⁴× puts
    * ~10⁸ candidate pairs on a single join key, i.e. one straggler task
    * no matter how many executors exist).
    *
    * Salting (grid decomposition of the self-join): every row gets a
    * deterministic salt cell `hash(doc_id) % S`; each side is replicated
    * S× over the OTHER side's possible cells, and the join key becomes
    * `(keyCols, salt_x, salt_y)` — so each pair matches exactly once and
    * a hot bucket's m² pairs spread over S² independent join keys
    * (bounded per-key ⇒ bounded per-task, independent of AQE). Cost:
    * S× replication of the narrow banded rows — why it's opt-in via
    * [[SaltBucketsConf]].
    *
    * Output columns are the input's, prefixed `x_` / `y_`. */
  private[operators] def saltedSelfPairs(banded: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val spark = banded.sparkSession
    val s = saltBuckets(spark)
    val xs = banded.toDF(banded.columns.toIndexedSeq.map("x_" + _): _*)
    val ys = banded.toDF(banded.columns.toIndexedSeq.map("y_" + _): _*)
    val keyCond = keyCols.map(k => col(s"x_$k") === col(s"y_$k")).reduce(_ && _)
    val lt = col("x_doc_id") < col("y_doc_id")
    if (s <= 1) xs.join(ys, keyCond && lt)
    else {
      val cells = array((0 until s).map(lit): _*)
      val xsS = xs.withColumn("x_salt", pmod(hash(col("x_doc_id")), lit(s)))
        .withColumn("x_rep", explode(cells))
      val ysS = ys.withColumn("y_salt", pmod(hash(col("y_doc_id")), lit(s)))
        .withColumn("y_rep", explode(cells))
      xsS.join(ysS,
          keyCond && col("x_salt") === col("y_rep") &&
            col("x_rep") === col("y_salt") && lt)
        .drop("x_salt", "x_rep", "y_salt", "y_rep")
    }
  }

  // Shared feature stage for the MinHash and SimHash sketches: the
  // post-hash (doc_id, h) longs from the managed [[Features]] cache —
  // hashed once per session, unpersisted by Features.clear() at end of
  // run. The SQL twin below stays in the pre-hash string form; the oracle
  // replays the identical bits because md5u32 is engine-portable.
  private[operators] val docShinglesSql =
    s"SELECT doc_id, unnest(ss) AS w FROM (SELECT doc_id, ${shinglesSql("text")} AS ss FROM documents)"

  // --- Shared MinHash machinery (q35 candidate generation, q54/q59
  // verify reuse, q69's incremental new×old variant). ONE definition per
  // stage so the cache key `$dir#minhashSig` can only ever hold one
  // semantics — the round-2 advisor flagged that q35 and q69 carried
  // duplicate inline copies that the shared cache would silently fork.

  /** k=[[MinHashK]] signature table (doc_id, m0..m15), built ONCE per
    * (session, dir) over the post-hash shingle longs and read by every
    * MinHash consumer — q35's self-join reads it from three sides. */
  private def minhashSig(spark: SparkSession, dir: String): DataFrame =
    Features.cachedFrame(spark, s"$dir#minhashSig") {
      Features.hashedShingles(spark, dir)
        .groupBy(col("doc_id"))
        .agg(min(perm(0, col("h"))).as("m0"),
          (1 until MinHashK).map(i => min(perm(i, col("h"))).as(s"m$i")): _*)
    }

  /** LSH banding of a signature table: (doc_id, band, bh) with
    * [[LshBands]] rows per doc — the blocking key for candidate joins. */
  private def sigBands(sig: DataFrame): DataFrame = {
    val bandCols = (0 until LshBands).map { b =>
      val ms = (0 until LshRows).map(r => col(s"m${b * LshRows + r}"))
      struct(lit(b).as("band"), md5(concat_ws(",", ms: _*)).as("bh")).as(s"band$b")
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
  }

  /** Component-agreement count between `a_`/`b_`-prefixed signature sides
    * (join [[minhashSig]] renamed via `toDF("a_..")`/`toDF("b_..")`).
    * `nMatches >= MinHashMatchMin` is the near-dup acceptance test. */
  private def nMatches: Column = (0 until MinHashK)
    .map(i => when(col(s"a_m$i") === col(s"b_m$i"), 1).otherwise(0))
    .reduce(_ + _)

  /** ≥13/16 agreeing components ≈ estimated Jaccard ≥ 0.8. */
  private val MinHashMatchMin = 13

  /** Content fingerprint (md5 of the sorted-unique-token bag) of a raw
    * `(doc_id, text)` frame — the uncached derivation used both by the
    * batch queries and by streaming micro-batches, where no dir-keyed
    * cache applies. */
  private[graft] def contentFpOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), contentFp(col("text")).as("fp"))

  /** MinHash signature of a raw `(doc_id, text)` frame — the uncached
    * twin of [[minhashSig]] for streaming micro-batches. Same shingle →
    * md5u32 → k-min pipeline, so signatures are comparable across the
    * cached corpus index and a freshly-ingested batch. */
  private[graft] def minhashSigOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(shingles(col("text"))).as("w"))
      .select(col("doc_id"), md5u32(col("w")).as("h"))
      .groupBy(col("doc_id"))
      .agg(min(perm(0, col("h"))).as("m0"),
        (1 until MinHashK).map(i => min(perm(i, col("h"))).as(s"m$i")): _*)

  /** The incremental-dedup cascade against prebuilt corpus indexes —
    * the core shared by batch q69 and the streaming ingest loop
    * ([[graft.streaming.DedupStreams.incrementalDedup]]):
    *   1. exact content match: `fp` equi-join vs the corpus fingerprint
    *      index;
    *   2. else near-dup: MinHash band join new×corpus, ≥13/16 signature
    *      agreement;
    *   3. else unique → admit.
    * All joins are new×corpus equi-joins on fingerprint/band keys, so
    * incremental cost scales with the batch, not the corpus. Output:
    * `(doc_id, status ∈ {dup_exact, dup_near, unique}, match_doc)`. */
  /** Serialized corpus membership sketches for [[incrementalDecisions]]'
    * pre-join pruning: a Bloom filter over the corpus content
    * fingerprints and one over its LSH band keys. At 100 TB the corpus
    * index is a big table on the far side of two shuffles per
    * micro-batch; these few-hundred-KB sketches ride the PLAN to every
    * task and discard definite-miss batch rows at scan position — most
    * of a crawl batch is new content, so most rows never reach either
    * join. False positives (fpp) only cost a wasted probe; false
    * negatives don't exist, so decisions are bit-identical with or
    * without the sketches (q72 shares q69's oracle row). A growing
    * deployment rebuilds them on the index-compaction cadence
    * (`BloomFilter.mergeInPlace` makes the refresh incremental). */
  final case class CorpusBlooms(fpBloom: Array[Byte], bandBloom: Array[Byte],
      expectedItems: Long, fpp: Double)

  /** `stat.bloomFilter` that survives an EMPTY frame: Spark 4.1 NPEs
    * inside the call on one (its internal aggregate yields null), so
    * the emptiness check must come FIRST, substituting a fresh
    * (bit-compatible, matches-nothing) filter. Empty inputs are
    * legitimate — a bootstrap corpus with no docs yet, or a signature
    * side with no rows because every doc had <3 tokens
    * ([[minhashSigOf]] drops shingle-less docs while [[contentFpOf]]
    * keeps them, so fp and sig emptiness are independent). */
  private def safeBloom(df: DataFrame, column: String, n: Long,
      fpp: Double): org.apache.spark.util.sketch.BloomFilter =
    if (df.isEmpty) org.apache.spark.util.sketch.BloomFilter.create(n, fpp)
    else df.stat.bloomFilter(column, n, fpp)

  /** Build the sketches from the materialized corpus indexes (one pass
    * each via the public `DataFrameStatFunctions.bloomFilter`). The
    * (expectedItems, fpp) parameters ride along so later increments
    * ([[mergeBlooms]]) build bit-compatible filters. */
  private[graft] def corpusBlooms(corpusFp: DataFrame, corpusSig: DataFrame,
      expectedItems: Long = 100000L, fpp: Double = 0.01): CorpusBlooms = {
    import graft.functions.BloomExprs.serialize
    val fpB = safeBloom(corpusFp, "fp", expectedItems, fpp)
    val bandB = safeBloom(
      sigBands(corpusSig).select(concat_ws(":", col("band"), col("bh")).as("bk")),
      "bk", expectedItems * LshBands, fpp)
    CorpusBlooms(serialize(fpB), serialize(bandB), expectedItems, fpp)
  }

  /** Fold newly-admitted rows into existing corpus sketches WITHOUT
    * rescanning the corpus: sketch just the increment (same parameters
    * ⇒ bit-compatible) and `mergeInPlace`. This is what keeps a
    * REFRESHING index's blooms truthful — a stale bloom is the one way
    * this design can produce a false negative (a just-admitted doc's
    * duplicate pruned away), so admit and merge must travel together
    * (`DedupStreamsSpec` proves the late-duplicate catch with blooms
    * on). */
  private[graft] def mergeBlooms(base: CorpusBlooms,
      addFp: DataFrame, addSig: DataFrame): CorpusBlooms = {
    import graft.functions.BloomExprs.serialize
    // Either side may independently be empty ([[safeBloom]]'s scaladoc:
    // an all-duplicates batch admits nothing; short-doc batches have fp
    // rows but no signature rows) — the substitute empty filter makes
    // mergeInPlace a no-op for that side.
    def read(b: Array[Byte]) =
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(b))
    val fpB = read(base.fpBloom)
    fpB.mergeInPlace(safeBloom(addFp, "fp", base.expectedItems, base.fpp))
    val bandB = read(base.bandBloom)
    bandB.mergeInPlace(safeBloom(
      sigBands(addSig).select(concat_ws(":", col("band"), col("bh")).as("bk")),
      "bk", base.expectedItems * LshBands, base.fpp))
    base.copy(fpBloom = serialize(fpB), bandBloom = serialize(bandB))
  }

  private[graft] def incrementalDecisions(
      newFp: DataFrame, newSig: DataFrame,
      corpusFp: DataFrame, corpusSig: DataFrame,
      blooms: Option[CorpusBlooms] = None): DataFrame = {
    import graft.functions.BloomExprs.mightContain
    // call_function resolves through the session registry — make sure
    // the engine functions exist on sessions not built via GraftSession.
    blooms.foreach(_ => graft.plans.GraftExtensions.register(newFp.sparkSession))
    val oldFp = corpusFp.select(col("doc_id").as("o_id"), col("fp").as("o_fp"))
    // Bloom pre-prune (optional): drop batch rows whose key definitely
    // isn't in the corpus BEFORE the join shuffles anything. Only the
    // JOIN PROBE sides are filtered — the final decision assembly below
    // keeps every batch doc_id, and a pruned row could only have
    // produced an empty join result, so output is unchanged.
    val exactProbe = blooms.fold(newFp)(b =>
      newFp.filter(mightContain(col("fp"), b.fpBloom)))
    val exact = exactProbe.join(oldFp, col("fp") === col("o_fp"))
      .groupBy(col("doc_id")).agg(min(col("o_id")).as("exact_match"))

    val nbAll = sigBands(newSig)
    val nb = blooms.fold(nbAll)(b => nbAll.filter(
      mightContain(concat_ws(":", col("band"), col("bh")), b.bandBloom)))
    val ob = sigBands(corpusSig).toDF("o_id", "o_band", "o_bh")
    val cand = nb.join(ob, col("band") === col("o_band") && col("bh") === col("o_bh"))
      .select(col("doc_id"), col("o_id"))
      .distinct()
    val sa = newSig.toDF(newSig.columns.toIndexedSeq.map(c => s"a_$c"): _*)
    val sb = corpusSig.toDF(corpusSig.columns.toIndexedSeq.map(c => s"b_$c"): _*)
    val near = cand
      .join(sa, col("doc_id") === col("a_doc_id"))
      .join(sb, col("o_id") === col("b_doc_id"))
      .filter(nMatches >= MinHashMatchMin)
      .groupBy(col("doc_id")).agg(min(col("o_id")).as("near_match"))

    newFp.select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("exact_match").isNotNull, "dup_exact")
          .when(col("near_match").isNotNull, "dup_near")
          .otherwise("unique").as("status"),
        coalesce(col("exact_match"), col("near_match"), lit(-1L))
          .as("match_doc"))
  }

  // ---------------------------------------------------------------- q34
  /** Content-normalized exact dedup: group by the sorted-unique-token
    * fingerprint; report every duplicate cluster. Catches the
    * word-shuffled duplicates planted in the testdata. */
  private def q34(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("doc_id"), contentFp(col("text")).as("fp_content"))
      .groupBy(col("fp_content"))
      .agg(
        count(lit(1)).as("cluster_size"),
        min(col("doc_id")).as("canonical_doc"),
        max(col("doc_id")).as("max_doc"))
      .filter(col("cluster_size") > 1L)
      .orderBy(col("fp_content"))
  }

  private val q34Sql = {
    s"""SELECT ${contentFpSql("text")} AS fp_content,
       |  count(*) AS cluster_size,
       |  min(doc_id) AS canonical_doc,
       |  max(doc_id) AS max_doc
       |FROM documents
       |GROUP BY 1
       |HAVING count(*) > 1
       |ORDER BY fp_content""".stripMargin
  }

  // ---------------------------------------------------------------- q35
  /** MinHash + LSH near-dup pairs.
    *
    * k=16 permutations over md5-derived word hashes, 4 bands × 4 rows;
    * candidate pairs share ≥1 band; kept if ≥13/16 signature components
    * match (est. Jaccard ≥ 0.8). One shuffle to build signatures, one
    * banded self-join for candidates — never all-pairs. */
  /** q35's candidate-generation + signature-verify stage over an explicit
    * signature frame (everything but the final presentation sort): banded
    * candidate self-join (salting-aware), shared-band count, and the
    * ≥13/16 signature-agreement accept. ONE definition, shared by q35 and
    * the scale harness's salting wall-clock experiment
    * ([[graft.ScaleBench]]) so the measured pipeline IS the production
    * pipeline. */
  private[graft] def minhashVerifiedPairs(sig: DataFrame): DataFrame = {
    val cand = saltedSelfPairs(sigBands(sig), Seq("band", "bh"))
      .groupBy(col("x_doc_id").as("doc_a"), col("y_doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
    val sa = sig.toDF(sig.columns.toIndexedSeq.map(c => s"a_$c"): _*)
    val sb = sig.toDF(sig.columns.toIndexedSeq.map(c => s"b_$c"): _*)
    cand
      .join(sa, col("doc_a") === col("a_doc_id"))
      .join(sb, col("doc_b") === col("b_doc_id"))
      .withColumn("n_matches", nMatches)
      .filter(col("n_matches") >= MinHashMatchMin)
      .select(col("doc_a"), col("doc_b"), col("n_shared_bands"),
        col("n_matches"),
        (col("n_matches").cast(DoubleType) / lit(MinHashK).cast(DoubleType))
          .as("est_jaccard"))
  }

  private def q35(spark: SparkSession, dir: String): DataFrame =
    // signature table read 3× inside (banding + both join-backs) → cache
    minhashVerifiedPairs(minhashSig(spark, dir))
      .orderBy(col("doc_a"), col("doc_b"))

  private val q35Sql = {
    val mins = (0 until MinHashK)
      .map(i => s"min(${permSql(i, "h")}) AS m$i").mkString(",\n    ")
    val bandSelects = (0 until LshBands).map { b =>
      val ms = (0 until LshRows).map(r => s"m${b * LshRows + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws(',', $ms)) AS bh FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    val matches = (0 until MinHashK)
      .map(i => s"CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH words AS ($docShinglesSql),
       |hashed AS (SELECT doc_id, ${md5u32Sql("w")} AS h FROM words),
       |sig AS (
       |  SELECT doc_id,
       |    $mins
       |  FROM hashed GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_shared_bands
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, n_shared_bands,
       |  ($matches) AS n_matches,
       |  CAST(($matches) AS DOUBLE) / CAST($MinHashK AS DOUBLE) AS est_jaccard
       |FROM cand
       |JOIN sig sa ON sa.doc_id = doc_a
       |JOIN sig sb ON sb.doc_id = doc_b
       |WHERE ($matches) >= $MinHashMatchMin
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---------------------------------------------------------------- q36
  /** SimHash near-dup pairs.
    *
    * 32-bit sign-aggregated fingerprint over word hashes; pairs with
    * hamming distance ≤ 3 found via 4×8-bit band blocking (pigeonhole:
    * ≤3 differing bits ⇒ at least one band identical).
    *
    * Scale posture, measured honestly: each 8-bit band has ≤256
    * buckets, so candidate volume grows ~n²/256 per band — the direct
    * 100× ScaleBench sweep (500k docs) clocked q36 at 68× for 100×
    * rows, the quadratic-candidate regime the hamming filter only
    * softens. The production path at that density is a WIDER
    * fingerprint (64/128-bit simhash with the same pigeonhole banding —
    * more bands × more bits each keeps the radius-3 guarantee while
    * multiplying bucket count by 2⁸ per widening step); changing the
    * fingerprint width changes which pairs are near-dups, so it is a
    * corpus-versioned redeploy decision (q96/q98's fidelity audits
    * exist to price it), now shipped as [[SimHashBitsConf]]. */
  /** Fingerprint width for the SimHash scan (q36 + q98): 32 (default —
    * the oracle-pinned output) or 64. Why 64 exists, measured: the
    * direct 100× ScaleBench sweep clocked the 32-bit path at ×68
    * (0.71 → 48.0 s for 100× rows) because its radius-3 pigeonhole
    * banding is 4×8-bit — 256 buckets per band, so candidates grow
    * ~n²/256 no matter what AQE or salting do. At 64 bits the SAME
    * radius-3 guarantee bands as 4×16-bit — 65,536 buckets per band,
    * cutting candidate volume 256× (the exact `lshBands`/`lshBits`
    * move that took q40 from 147 s to 9.6 s). Semantics shift with
    * width: hamming ≤ 3 of 64 estimates cos ≥ cos(3π/64) ≈ 0.989 vs
    * ≈ 0.957 at 32 — a STRICTER near-dup definition, so switching is
    * a corpus-versioned redeploy decision and the default stays 32;
    * q98 re-scores whichever path is live (its estimator follows the
    * width) and `SimHashWidthSpec` pins exact-dup recall plus
    * fidelity on the wide path. Loud rejection of anything but
    * {32, 64} — a typo must not silently run the narrow scan. */
  val SimHashBitsConf = "spark.graft.simhash.bits"

  private[graft] def simhashBits(spark: SparkSession): Int =
    spark.conf.getOption(SimHashBitsConf) match {
      case None => SimHashBits
      case Some(raw) =>
        val b = raw.trim.toIntOption.getOrElse(
          throw new IllegalArgumentException(
            s"$SimHashBitsConf must be 32 or 64, got '$raw'"))
        require(b == 32 || b == 64,
          s"$SimHashBitsConf must be 32 or 64, got $b")
        b
    }

  /** q36's verified pairs (doc_a, doc_b, hamming ≤ 3), pre-sort —
    * shared with the fidelity audit (q98), which re-scores exactly the
    * pairs the production sketch ships. Dispatches on
    * [[SimHashBitsConf]]: the default 32-bit body is untouched (plan
    * pins + oracle); 64 widens fingerprint AND bands. */
  private def simhashVerifiedPairs(spark: SparkSession, dir: String): DataFrame =
    if (simhashBits(spark) == 64) simhashVerifiedPairs64(spark, dir)
    else simhashVerifiedPairs32(spark, dir)

  /** 64-bit production path: 64 sign bits from the md5's two
    * independent 32-bit lanes ([[Features.hashedShingles2]]), banded
    * 4×16-bit — the radius-3 pigeonhole holds exactly as at 32 (3
    * differing bits cannot touch all 4 bands) while each band carries
    * 2¹⁶ buckets. Bit 63 lands on the long's sign bit; the bit terms
    * are disjoint so their sum IS the bitwise OR (no carries), and
    * both `shiftright` (arithmetic) band extractions mask to 16 bits,
    * so the sign extension never leaks into a band value. */
  private def simhashVerifiedPairs64(spark: SparkSession, dir: String): DataFrame = {
    val half = SimHashBits // 32 bits per md5 lane
    val bitSums = Features.hashedShingles2(spark, dir)
      .groupBy(col("doc_id"))
      .agg(sum(simBit(0, col("h"))).as("s0"),
        ((1 until half).map(j => sum(simBit(j, col("h"))).as(s"s$j")) ++
          (0 until half).map(j =>
            sum(simBit(j, col("h2"))).as(s"s${half + j}"))): _*)
    val simhash = (0 until 2 * half)
      .map(j => when(col(s"s$j") > 0L, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val fp = Features.cachedFrame(spark, s"$dir#simhashFp64") {
      bitSums.select(col("doc_id"), simhash.as("simhash"))
    }
    val banded = fp.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16)
            .bitwiseAND(lit(0xFFFFL)).as("bv"))): _*)).as("bb"))
      .select(col("doc_id"), col("simhash"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
    saltedSelfPairs(banded, Seq("band", "bv"))
      .select(col("x_doc_id").as("doc_a"), col("y_doc_id").as("doc_b"),
        bit_count(col("x_simhash").bitwiseXOR(col("y_simhash"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .distinct()
  }

  private def simhashVerifiedPairs32(spark: SparkSession, dir: String): DataFrame = {
    val bitSums = Features.hashedShingles(spark, dir)
      .groupBy(col("doc_id"))
      .agg(sum(simBit(0, col("h"))).as("s0"),
        (1 until SimHashBits).map(j => sum(simBit(j, col("h"))).as(s"s$j")): _*)
    val simhash = (0 until SimHashBits)
      .map(j => when(col(s"s$j") > 0L, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    // both sides of the band self-join read this → managed cache
    val fp = Features.cachedFrame(spark, s"$dir#simhashFp") {
      bitSums.select(col("doc_id"), simhash.as("simhash"))
    }

    val banded = fp.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * SimHashBandBits)
            .bitwiseAND(lit(255L)).as("bv"))): _*)).as("bb"))
      .select(col("doc_id"), col("simhash"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))

    // Filter BEFORE distinct: the band join emits ~n²/buckets candidate
    // rows; hamming prunes them to a handful, and dedup of the survivors
    // is then free (distinct over millions of pre-filter rows was the
    // dominant cost of this query at sf0.1).
    saltedSelfPairs(banded, Seq("band", "bv"))
      .select(col("x_doc_id").as("doc_a"), col("y_doc_id").as("doc_b"),
        bit_count(col("x_simhash").bitwiseXOR(col("y_simhash"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .distinct()
  }

  private def q36(spark: SparkSession, dir: String): DataFrame =
    simhashVerifiedPairs(spark, dir)
      .orderBy(col("doc_a"), col("doc_b"))

  private val q36Sql = {
    val bitSums = (0 until SimHashBits)
      .map(j => s"CAST(sum(${simBitSql(j, "h")}) AS BIGINT) AS s$j")
      .mkString(",\n    ")
    val simhash = (0 until SimHashBits)
      .map(j => s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    val bandSelects = (0 until 4).map { b =>
      s"SELECT doc_id, simhash, $b AS band, (simhash >> ${b * SimHashBandBits}) & 255 AS bv FROM fp"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH words AS ($docShinglesSql),
       |hashed AS (SELECT doc_id, ${md5u32Sql("w")} AS h FROM words),
       |bits AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM hashed GROUP BY doc_id),
       |fp AS (SELECT doc_id, CAST($simhash AS BIGINT) AS simhash FROM bits),
       |banded AS (
       |  $bandSelects)
       |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |  CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
       |FROM banded x JOIN banded y
       |  ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---------------------------------------------------------------- q37
  /** Document-frequency cap for candidate generation: only shingles seen
    * in ≤ this many documents index candidate pairs. Near-duplicate pairs
    * share passages — i.e. shingles nearly unique to them — so rare
    * shingles find every real pair, while the super-common shingles that
    * would blow the inverted-index join up quadratically contribute no
    * evidence. This is the standard prefix/rare-token filter of
    * set-similarity joins and is the piece that makes the query survive a
    * 100× scale-up. */
  val ShingleDfCap = 10L

  /** Candidate pairs sharing ≥2 RARE shingles (df ≤ [[ShingleDfCap]]) —
    * the inverted-index prefix filter shared by the Jaccard top-20 (q37)
    * and the containment scan (q88). Near-dup/contained pairs share
    * passages — i.e. shingles nearly unique to them — so rare shingles
    * find every real pair while the super-common shingles that would
    * blow the self-join up quadratically contribute no evidence. The
    * groupBy doubles as the distinct. */
  private def rareShingleCandidates(spark: SparkSession, dir: String): DataFrame = {
    val post = Features.hashedShingles(spark, dir)
      .select(col("doc_id"), col("h").as("s"))
    val rareShingles = post.groupBy(col("s"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= ShingleDfCap)
      .select(col("s"))
    val rare = post.join(rareShingles, "s")
    rare.as("x").join(rare.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_rare_common"))
      .filter(col("n_rare_common") >= 2L)
      .select(col("doc_a"), col("doc_b"))
  }

  /** Word-3-gram (shingle) Jaccard top-20 — order-sensitive
    * near-duplication (catches copied passages, not shuffled bags of
    * words; q34/q35 catch those). Candidates come from an inverted-index
    * join restricted to rare shingles ([[ShingleDfCap]]); the Jaccard
    * itself is then computed *exactly* over the candidates' full shingle
    * sets with an array intersect — cheap, because candidates are few.
    *
    * The inverted index is built on the HASHED shingles (the shared
    * [[Features.hashedShingles]] cache): the df-count and candidate
    * self-join shuffle 8-byte longs instead of 3-word strings — same
    * candidates (md5 collisions would only merge two shingles' postings,
    * identically in both engines), several× less shuffle volume. */
  /** q37's candidate→exact-verify chain pre-presentation: every rare-
    * shingle candidate pair with its exact Jaccard. ONE definition,
    * shared by q37's top-20 report and the method-agreement audit
    * (q108), so the audited pipeline IS the production pipeline. */
  /** Memoized: five queries read this exact-verified pair table (q37's
    * top-k, q88's containment, q96's fidelity audit, q129's recall
    * audit, q142's parameter sweep) — the intersect-verify pass runs
    * once per session, and the cached frame is candidate-pairs-sized
    * (df-capped, bounded), not corpus-sized. */
  private def jaccardScoredPairs(spark: SparkSession, dir: String): DataFrame =
    Features.cachedFrame(spark, s"$dir#jaccardPairs") {
      jaccardScoredPairsBuild(spark, dir)
    }

  private def jaccardScoredPairsBuild(spark: SparkSession, dir: String): DataFrame = {
    // exact-verify side: full shingle arrays (shared cache, q54 reads too)
    val sh = Features.shingleSets(spark, dir)
    val cand = rareShingleCandidates(spark, dir)
    val sa = sh.toDF("a_doc", "a_ss")
    val sb = sh.toDF("b_doc", "b_ss")
    cand
      .join(sa, col("doc_a") === col("a_doc"))
      .join(sb, col("doc_b") === col("b_doc"))
      .withColumn("n_common",
        size(array_intersect(col("a_ss"), col("b_ss"))).cast("long"))
      .filter(col("n_common") >= 2L)
      .withColumn("n_union",
        size(col("a_ss")).cast("long") + size(col("b_ss")).cast("long") -
          col("n_common"))
      .withColumn("jaccard",
        col("n_common").cast(DoubleType) / col("n_union").cast(DoubleType))
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("n_union"),
        col("jaccard"))
  }

  private def q37(spark: SparkSession, dir: String): DataFrame =
    jaccardScoredPairs(spark, dir)
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(20)

  private val q37Sql = {
    s"""WITH sh AS (
       |  SELECT doc_id, ${shinglesSql("text")} AS ss
       |  FROM documents),
       |post AS (SELECT doc_id, ${md5u32Sql("w")} AS s
       |         FROM (SELECT doc_id, unnest(ss) AS w FROM sh)),
       |rare_s AS (SELECT s FROM post GROUP BY s HAVING count(*) <= $ShingleDfCap),
       |rare AS (SELECT doc_id, p.s FROM post p JOIN rare_s USING (s)),
       |cand AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM rare x JOIN rare y ON x.s = y.s AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2
       |  HAVING count(*) >= 2),
       |scored AS (
       |  SELECT doc_a, doc_b,
       |    CAST(len(list_intersect(sa.ss, sb.ss)) AS BIGINT) AS n_common,
       |    CAST(len(sa.ss) AS BIGINT) + CAST(len(sb.ss) AS BIGINT) AS n_total
       |  FROM cand
       |  JOIN sh sa ON sa.doc_id = doc_a
       |  JOIN sh sb ON sb.doc_id = doc_b)
       |SELECT doc_a, doc_b, n_common,
       |  n_total - n_common AS n_union,
       |  CAST(n_common AS DOUBLE) / CAST(n_total - n_common AS DOUBLE) AS jaccard
       |FROM scored
       |WHERE n_common >= 2
       |ORDER BY jaccard DESC, doc_a, doc_b
       |LIMIT 20""".stripMargin
  }

  // ---------------------------------------------------------------- q45
  /** Exact byte-level dedup summary: one hash-groupBy on the
    * full-content fingerprint (`dropDuplicates` cardinality, per source).
    * The shuffle key is a uniform hash — perfectly balanced at any
    * scale; this is the first, cheapest pass of any dedup cascade. (The
    * testdata's planted duplicates are word-shuffled, so byte-exact
    * clusters are expected ~empty — the per-source cardinality is the
    * meaningful, always-populated report.) */
  private def q45(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("source"), md5(col("text")).as("fp"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_distinct"),
        (count(lit(1)) - countDistinct(col("fp"))).as("n_removed"))
      .orderBy(col("source"))
  }

  private val q45Sql =
    """SELECT source,
      |  count(*) AS n_docs,
      |  count(DISTINCT fp) AS n_distinct,
      |  count(*) - count(DISTINCT fp) AS n_removed
      |FROM (SELECT source, md5(text) AS fp FROM documents)
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q250
  /** HOT-SOURCE DUPLICATION DRILLDOWN — q45 says WHICH sources carry
    * duplicate mass; this is the second pass an operator actually
    * runs: take the 3 worst sources by exact-dup share and pull their
    * per-language profile (docs, distinct bodies, char mass) — is the
    * duplication concentrated in one language lane (a mirrored feed)
    * or uniform (a re-crawled source)? The find-then-drill shape q249
    * runs on events, on the DOCUMENT corpus.
    *
    * Scale posture: the rank leg is q45's sources-sized report with a
    * top-3 heap (TakeOrderedAndProject); the drill leg reads
    * [[graft.Tables.documentsBySource]] — on the source-PARTITIONED
    * warehouse layout the 3-row broadcast becomes a DPP subquery in
    * the drill scan's PartitionFilters, so the second pass over a
    * 10¹¹-doc corpus LISTS three source directories instead of
    * re-scanning (PlanShapeSpec pins the subquery and flat≡partitioned
    * rows). Each leg carries ONE distinct aggregate (no multi-distinct
    * Expand). Determinism: micro floor-div share, ties by source. */
  private def q250(spark: SparkSession, dir: String): DataFrame = {
    // rank by the PRODUCTION dedup key (contentFp — the sorted-unique
    // token bag q33/q45/q60 decide on), not raw md5: byte-identity is
    // degenerate on feeds whose duplication is shuffled/stuttered
    // template content (the blessed testdata has ZERO byte-exact dups
    // but real bag-level duplication — exactly q161's lift story)
    val hot = Tables.documents(spark, dir)
      .select(col("source"), contentFp(col("text")).as("fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("sn"), countDistinct(col("fp")).as("sd"))
      .withColumn("dup_share_u", expr("(1000000 * (sn - sd)) div sn"))
      .orderBy(col("dup_share_u").desc, col("source"))
      .limit(3)
      // a dup-free source is not "hot" — and the predicate doubles as
      // the selective filter Spark's PartitionPruning rule requires on
      // the dim side before it will inject the DPP subquery
      .filter(col("dup_share_u") > 0L)
      .select(col("source").as("hot_source"), col("dup_share_u"))
    Tables.documentsBySource(spark, dir)
      .join(broadcast(hot), col("source") === col("hot_source"))
      .groupBy(col("source"), col("lang"))
      .agg(max(col("dup_share_u")).as("dup_share_u"),
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        countDistinct(contentFp(col("text"))).as("n_distinct"))
      .orderBy(col("source"), col("lang"))
  }

  private lazy val q250Sql =
    s"""WITH rank AS (
      |  SELECT source, count(*) AS sn,
      |    count(DISTINCT ${contentFpSql("text")}) AS sd
      |  FROM documents GROUP BY 1),
      |hot AS (
      |  SELECT * FROM (
      |    SELECT source AS hot_source,
      |      (1000000 * (sn - sd)) // sn AS dup_share_u
      |    FROM rank ORDER BY dup_share_u DESC, source LIMIT 3)
      |  WHERE dup_share_u > 0)
      |SELECT d.source, lang,
      |  max(dup_share_u) AS dup_share_u,
      |  count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
      |  CAST(count(DISTINCT ${contentFpSql("text")}) AS BIGINT) AS n_distinct
      |FROM documents d JOIN hot ON d.source = hot_source
      |GROUP BY 1, 2
      |ORDER BY source, lang""".stripMargin

  // ---------------------------------------------------------------- q54
  /** The verify stage of the dedup cascade: candidates from the cheap
    * sketch (q35's MinHash/LSH pairs) re-scored with an exact
    * edit-distance — integer-exact in both engines, so the full
    * candidate→verify cascade is oracle-checked end-to-end. Candidate
    * count is sketch-bounded, so the O(len²) Levenshtein only ever runs
    * on a vanishing fraction of pairs — the property that makes exact
    * verification affordable at 100 TB. */
  private def q54(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val ta = docs.select(col("doc_id").as("a_id"), col("text").as("a_text"),
      col("n_chars").as("a_len"))
    val tb = docs.select(col("doc_id").as("b_id"), col("text").as("b_text"),
      col("n_chars").as("b_len"))
    q35(spark, dir)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
      .join(ta, col("doc_a") === col("a_id"))
      .join(tb, col("doc_b") === col("b_id"))
      .withColumn("edit_dist",
        levenshtein(col("a_text"), col("b_text")).cast("long"))
      .withColumn("max_len", greatest(col("a_len"), col("b_len")))
      .withColumn("edit_sim",
        lit(1.0) - col("edit_dist").cast(DoubleType) /
          col("max_len").cast(DoubleType))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
        col("edit_dist"), col("edit_sim"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val q54Sql =
    s"""WITH cand AS ($q35Sql)
       |SELECT doc_a, doc_b, est_jaccard,
       |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
       |  1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE)
       |      / CAST(greatest(a.n_chars, b.n_chars) AS DOUBLE) AS edit_sim
       |FROM cand
       |JOIN documents a ON a.doc_id = doc_a
       |JOIN documents b ON b.doc_id = doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- q59
  /** The verify stage again (q54), but with the engine's native banded
    * edit distance ([[graft.functions.BoundedEditDistance]]): per pair,
    * edit budget k = 20% of the longer doc, distance computed as
    * `min(lev, k+1)` in O(k·len) with early exit instead of the full
    * O(len²) matrix. The oracle replays the same semantics with its full
    * `levenshtein` capped by `least(d, k+1)` — proving the banded
    * shortcut returns exactly the capped truth. */
  private def q59(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextExprs.ensureRegistered(spark)
    val docs = Tables.documents(spark, dir)
    val ta = docs.select(col("doc_id").as("a_id"), col("text").as("a_text"),
      col("n_chars").as("a_len"))
    val tb = docs.select(col("doc_id").as("b_id"), col("text").as("b_text"),
      col("n_chars").as("b_len"))
    q35(spark, dir)
      .select(col("doc_a"), col("doc_b"))
      .join(ta, col("doc_a") === col("a_id"))
      .join(tb, col("doc_b") === col("b_id"))
      .withColumn("k",
        floor(greatest(col("a_len"), col("b_len")).cast(DoubleType) * 0.2)
          .cast("int"))
      .withColumn("edit_capped",
        graft.functions.TextExprs.editWithin(col("a_text"), col("b_text"), col("k")))
      .select(col("doc_a"), col("doc_b"), col("k"), col("edit_capped"),
        (col("edit_capped") <= col("k")).as("within_budget"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val q59Sql =
    s"""WITH cand AS ($q35Sql),
       |j AS (
       |  SELECT doc_a, doc_b,
       |    CAST(floor(CAST(greatest(a.n_chars, b.n_chars) AS DOUBLE) * 0.2) AS INTEGER) AS k,
       |    CAST(levenshtein(a.text, b.text) AS INTEGER) AS d
       |  FROM cand
       |  JOIN documents a ON a.doc_id = doc_a
       |  JOIN documents b ON b.doc_id = doc_b)
       |SELECT doc_a, doc_b, k,
       |  CAST(least(d, k + 1) AS INTEGER) AS edit_capped,
       |  d <= k AS within_budget
       |FROM j
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- q56
  /** The final stage of the dedup cascade: near-dup PAIRS (q35) →
    * duplicate CLUSTERS via connected components, so a keep-one-per-
    * cluster policy can act (the canonical doc = min doc_id — what a
    * training-data dedup actually deletes against).
    *
    * Algorithm: distributed min-label propagation. Every node starts
    * labelled with its own id; each round joins labels across edges and
    * takes the min; stops at fixpoint. Each round is one shuffle join +
    * one partial-aggregable groupBy — fully distributed; the driver only
    * sees the convergence COUNT, never the data. Rounds ≤ component
    * diameter, and near-dup clusters are tiny dense cliques (diameter
    * 1-2), so this converges in 2-3 rounds regardless of corpus size. A
    * pathological chain-shaped component would take O(diameter) rounds —
    * the published fix (large-star/small-star, Kiveris et al., "Connected
    * Components in MapReduce and Beyond") drops it to O(log n) rounds
    * with the same per-round plan shape; not needed at dedup's graph
    * shapes. */
  /** Converged component labels (id, lbl = min reachable doc_id) for the
    * q35 near-dup graph — the fixpoint shared by q56 and q60, memoized
    * per (session, dir) since the loop runs actions. Rides
    * [[ccLabelsAuto]]: one-hop propagation with the star-operator
    * escalation armed (never triggered on dup graphs — diameter 1-2). */
  private def ccLabels(spark: SparkSession, dir: String): DataFrame =
    Features.cachedFrame(spark, s"$dir#ccLabels") {
      val pairs = q35(spark, dir).select(col("doc_a"), col("doc_b"))
      // Symmetric edge list, reused every round → managed cache, cut to
      // a LEAF: each fixpoint round plans a join against this frame, and
      // with a plain persist every round's driver-side planning re-walks
      // the full candidate-join lineage embedded in its InMemoryRelation.
      val edges = Features.cachedFrame(spark, s"$dir#dedupEdges") {
        pairs.union(pairs.select(col("doc_b"), col("doc_a")))
          .toDF("src", "dst").localCheckpoint()
      }
      ccLabelsAuto(edges).labels
    }

  /** How many one-hop rounds [[ccLabelsAuto]] spends before concluding
    * the graph is high-diameter and escalating to the star operators.
    * Dup cliques converge in 2-3, so 5 never fires on the intended
    * workload while capping a chain graph's round count at
    * budget + O(log n). */
  val CcHopBudget = 5

  /** One auto-escalating connected-components run: labels plus how far
    * each phase ran (`starRounds == 0` ⇔ one-hop converged in budget). */
  private[graft] final case class CcRun(labels: DataFrame, hopRounds: Int,
      starRounds: Int) {
    def escalated: Boolean = starRounds > 0
  }

  /** Connected components with AUTOMATIC algorithm escalation — the
    * heuristic the [[ccLabelsStar]] scaladoc promises: run cheap one-hop
    * min-label propagation (optimal for the dup workload's diameter-1-2
    * cliques); if it hasn't converged within `hopBudget` rounds, the
    * graph is high-diameter — CONTRACT it by the current labels (each
    * partially-converged label class becomes one supernode, edges become
    * label-pair edges, self-loops drop) and finish with the O(log n)
    * large-star/small-star operators on the contracted graph. Final
    * labels compose the two phases: `lbl(v) = starLbl(hopLbl(v))`.
    *
    * Correctness of the composition: hop labels never cross components,
    * every label value is a member node's id, and a component's min node
    * always labels itself — so the contracted graph has exactly one
    * supernode set per original component, containing the original min.
    * Star CC then assigns that min to the whole set.
    *
    * `edges` must be the symmetric (src, dst) list. Driver sees only
    * per-round convergence counts — no data ever collects. */
  private[graft] def ccLabelsAuto(edges: DataFrame,
      hopBudget: Int = CcHopBudget, maxStarRounds: Int = 60): CcRun = {
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")).persist()
    // One propagation hop: label := min(own, neighbors').
    def hop(l: DataFrame): DataFrame =
      edges.join(l, edges("src") === l("id"))
        .select(col("dst").as("id"), col("lbl"))
        .union(l)
        .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
    // Convergence via the MONOTONE label-sum invariant: every hop can
    // only DECREASE a node's label (min of own ∪ neighbors'), so
    // Σlbl strictly decreases iff any label changed — one aggregate
    // action per round (which doubles as the persist materialization),
    // replacing the old join-against-previous-generation + count that
    // paid a second full pass per round. decimal(38,0), not long: at
    // 10¹² nodes with 10¹²-scale ids the long sum overflows.
    def lblSum(l: DataFrame): java.math.BigDecimal = {
      val s = l.agg(sum(col("lbl").cast("decimal(38,0)"))).head().getDecimal(0)
      if (s == null) java.math.BigDecimal.ZERO else s // empty graph
    }
    var prevSum = lblSum(labels)
    var converged = false
    var rounds = 0
    while (!converged && rounds < hopBudget) {
      rounds += 1
      // One hop per convergence check. (Two hops per check was tried
      // and measured 8× SLOWER: nesting hop(hop(l)) makes the analyzer
      // deduplicate the doubly-self-referenced edge plan and defeats
      // the cached-exchange reuse that makes each round cheap.)
      val next = hop(labels).persist()
      val nextSum = lblSum(next) // the one driver-visible value per round
      labels.unpersist(blocking = false)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
    }
    if (converged) {
      // Return a LEAF, not the last persisted round: that frame's plan
      // nests every round's tree plus the full candidate-join lineage
      // inside its InMemoryRelation, and every downstream consumer
      // (q56/q60/q70, the funnels) re-walks that embedded tree on the
      // driver at EVERY execution — measured ~1.4 s of driver-side plan
      // processing per warm query against <0.2 s of task work. The
      // eager localCheckpoint reads the already-cached blocks once and
      // cuts the lineage to a 2-column LogicalRDD.
      val leaf = labels.localCheckpoint(true)
      labels.unpersist(blocking = false)
      CcRun(leaf, rounds, 0)
    } else {
      // Budget exhausted: high-diameter graph. Contract by the current
      // labels and let the star operators close the remaining distance
      // in O(log n) rounds. The contracted graph has ≤ as many nodes as
      // label classes — every hop round already paid for itself by
      // shrinking the star phase's input.
      val contracted = edges
        .join(labels.select(col("id").as("sid"), col("lbl").as("albl")),
          col("src") === col("sid"))
        .join(labels.select(col("id").as("did"), col("lbl").as("blbl")),
          col("dst") === col("did"))
        .select(col("albl").as("a"), col("blbl").as("b"))
        .filter(col("a") =!= col("b"))
      val (starLbls, starRounds) = ccLabelsStar(contracted, maxStarRounds)
      // Eager localCheckpoint (not persist+count): composed must be
      // SELF-CONTAINED before its parents are freed — a plain persisted
      // frame that lost a block would try to recompute through the
      // freed checkpoint below and fail.
      val composed = labels
        .join(starLbls.select(col("id").as("cid"), col("lbl").as("clbl")),
          col("lbl") === col("cid"), "left")
        .select(col("id"), coalesce(col("clbl"), col("lbl")).as("lbl"))
        .localCheckpoint(true)
      labels.unpersist(blocking = false)
      Features.freeFrame(starLbls) // its checkpoint served its purpose
      CcRun(composed, rounds, starRounds)
    }
  }

  /** Large-star/small-star connected components (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond") — the O(log n)-round
    * escalation the [[ccLabels]] scaladoc names for chain-shaped /
    * high-diameter components, as code. One-hop min propagation needs
    * O(diameter) rounds (a 1000-link chain ⇒ ~1000 shuffle rounds); the
    * star operators contract distances multiplicatively, converging in
    * O(log n) rounds with the SAME per-round plan shape (equi-join +
    * partial-aggregable min-groupBy; driver sees only counts).
    *
    * Per round:
    *  - large-star: every node u attaches its LARGER neighbors to
    *    m(u) = min(u ∪ N(u));
    *  - small-star: every node u attaches its ≤-neighbors and itself to
    *    m(u).
    * The edge set converges to per-component stars centered at the
    * component minimum; labels then read off as each node's min neighbor.
    *
    * q56 stays on the one-hop loop — near-dup clusters are diameter-1-2
    * cliques where 2-3 rounds beat the star operators' constant factors;
    * this is the documented escalation path, spec-proven on a 1000-link
    * chain (`DedupClusterSpec`) and decision-equal to q56's clustering on
    * the real dup graph.
    *
    * @return (labels (id, lbl = component min), rounds to converge) */
  private[graft] def ccLabelsStar(edgesIn: DataFrame,
      maxRounds: Int = 60): (DataFrame, Int) = {
    def canon(e: DataFrame): DataFrame =
      e.select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .filter(col("a") < col("b")).distinct()
    def sym(e: DataFrame): DataFrame =
      e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
    def mins(e: DataFrame): DataFrame =
      sym(e).groupBy(col("u")).agg(least(col("u"), min(col("v"))).as("m"))
    def largeStar(e: DataFrame): DataFrame =
      canon(sym(e).join(mins(e), "u").filter(col("v") > col("u"))
        .select(col("m").as("a"), col("v").as("b")))
    def smallStar(e: DataFrame): DataFrame = {
      val m = mins(e)
      canon(sym(e).join(m, "u").filter(col("v") <= col("u"))
        .select(col("m").as("a"), col("v").as("b"))
        .union(m.select(col("m").as("a"), col("u").as("b"))))
    }

    // localCheckpoint, not persist: each round references the previous
    // edge frame ~16× (sym/mins on both star operators), so the LOGICAL
    // plan grows exponentially in rounds unless lineage is truncated —
    // persist caches data but keeps the plan. (Non-replicated blocks are
    // acceptable for this escalation path; a production deployment points
    // reliable checkpointing at a scratch dir instead.)
    //
    // Each retired round's checkpoint blocks are freed via
    // [[Features.freeFrame]] (Dataset.unpersist is a no-op for
    // localCheckpoint-backed frames — the blocks would otherwise
    // accumulate until the ContextCleaner happens to GC them).
    var edges = canon(edgesIn.toDF("a", "b")).localCheckpoint(true)
    var edgeCount = edges.count()
    var rounds = 0
    var converged = false
    while (!converged) {
      rounds += 1
      require(rounds <= maxRounds, "star CC failed to converge")
      val ls = largeStar(edges).localCheckpoint(true)
      val next = smallStar(ls).localCheckpoint(true)
      val nextCount = next.count()
      // Fixpoint test: identical edge SETS (counts equal + no additions).
      converged = nextCount == edgeCount && next.except(edges).isEmpty
      Features.freeFrame(ls)
      Features.freeFrame(edges)
      edges = next
      edgeCount = nextCount
    }
    // Materialize the (tiny) label table off the final star edges, then
    // free that last checkpoint generation — labels would otherwise pin
    // the whole edge set's blocks through their lineage for as long as
    // the caller holds them.
    val labels = sym(edges).groupBy(col("u"))
      .agg(least(col("u"), min(col("v"))).as("lbl"))
      .select(col("u").as("id"), col("lbl"))
      .localCheckpoint(true)
    Features.freeFrame(edges)
    (labels, rounds)
  }

  private def q56(spark: SparkSession, dir: String): DataFrame = {
    ccLabels(spark, dir).groupBy(col("lbl").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("id")).as("max_doc"),
        sum(col("id")).as("sum_docs"))
      .orderBy(col("cluster_id"))
  }

  /** Transitive closure via recursive CTE — exact same fixpoint as the
    * propagation loop, solved declaratively by the oracle engine. Shared
    * by q56 and q60. */
  private val ccLabelsSqlCtes =
    s"""pairs AS (SELECT doc_a, doc_b FROM ($q35Sql)),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
       |reach(id, lbl) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id),
       |labels AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id)""".stripMargin

  private val q56Sql =
    s"""WITH RECURSIVE
       |$ccLabelsSqlCtes
       |SELECT lbl AS cluster_id,
       |  count(*) AS n_docs,
       |  max(id) AS max_doc,
       |  CAST(sum(id) AS BIGINT) AS sum_docs
       |FROM labels
       |GROUP BY lbl
       |ORDER BY cluster_id""".stripMargin

  // ---------------------------------------------------------------- q110
  /** DUPLICATION-PROFILE HISTOGRAM — the corpus-health metric a crawl
    * operator reads before choosing a dedup budget: how many documents
    * live in near-dup clusters of what size. Rides the memoized CC
    * labels (q56's components over q35's verified pairs); singletons —
    * documents in no cluster — are counted by one anti join, and every
    * cluster falls into a fixed power-of-two size band. A healthy crawl
    * is singleton-dominated with a thin geometric tail; mass migrating
    * into the big bands means template explosions or mirror floods
    * (exactly the viral-dup regime [[saltedSelfPairs]] defends), and
    * the `17+` band is the "investigate before dedup" list. Bands are
    * CASE buckets, not log() — exact integer comparisons carry zero
    * float-parity machinery.
    *
    * Scale posture: the label table is pairs-bounded (tiny next to the
    * corpus); sizes are one partial-aggregable groupBy on it; the
    * singleton count is one anti join of the corpus against the label
    * ids (co-located under id bucketing) feeding a single-row count —
    * the corpus never enters the fixpoint loop, and the report is
    * ≤ 6 rows. */
  private def q110(spark: SparkSession, dir: String): DataFrame = {
    val labels = ccLabels(spark, dir)
    val sizeBucket = when(col("sz") === 2L, "2")
      .when(col("sz") <= 4L, "3-4")
      .when(col("sz") <= 8L, "5-8")
      .when(col("sz") <= 16L, "9-16")
      .otherwise("17+")
    val clustered = labels.groupBy(col("lbl"))
      .agg(count(lit(1)).as("sz"))
      .select(sizeBucket.as("size_band"), col("sz"))
      .groupBy(col("size_band"))
      .agg(count(lit(1)).as("n_clusters"), sum(col("sz")).as("n_docs"))
    val singletons = Tables.documents(spark, dir).select(col("doc_id"))
      .join(labels.select(col("id")), col("doc_id") === col("id"),
        "left_anti")
      .agg(count(lit(1)).as("n"))
      .select(lit("1").as("size_band"), col("n").as("n_clusters"),
        col("n").as("n_docs"))
    // Numeric band rank, not string order — '17+' would otherwise
    // sort between '1' and '2' (same CASE rank in the oracle SQL).
    val bandRank = when(col("size_band") === "1", 0)
      .when(col("size_band") === "2", 1)
      .when(col("size_band") === "3-4", 2)
      .when(col("size_band") === "5-8", 3)
      .when(col("size_band") === "9-16", 4)
      .otherwise(5)
    singletons.unionByName(clustered).orderBy(bandRank)
  }

  private lazy val q110Sql =
    s"""WITH RECURSIVE
       |$ccLabelsSqlCtes,
       |sizes AS (SELECT lbl, count(*) AS sz FROM labels GROUP BY lbl),
       |clustered AS (
       |  SELECT CASE WHEN sz = 2 THEN '2'
       |              WHEN sz <= 4 THEN '3-4'
       |              WHEN sz <= 8 THEN '5-8'
       |              WHEN sz <= 16 THEN '9-16'
       |              ELSE '17+' END AS size_band,
       |    sz
       |  FROM sizes),
       |singles AS (
       |  SELECT count(*) AS n FROM documents d
       |  WHERE NOT EXISTS (SELECT 1 FROM labels l WHERE l.id = d.doc_id))
       |SELECT * FROM (
       |  SELECT '1' AS size_band, n AS n_clusters, n AS n_docs FROM singles
       |  UNION ALL
       |  SELECT size_band, count(*) AS n_clusters, CAST(sum(sz) AS BIGINT)
       |    AS n_docs
       |  FROM clustered GROUP BY size_band)
       |ORDER BY CASE size_band WHEN '1' THEN 0 WHEN '2' THEN 1
       |  WHEN '3-4' THEN 2 WHEN '5-8' THEN 3 WHEN '9-16' THEN 4
       |  ELSE 5 END""".stripMargin

  // ---------------------------------------------------------------- q60
  /** The operator a 100 TB curation run actually executes: the per-doc
    * KEEP/DROP decision table. Every document gets its near-dup cluster
    * canonical (min doc_id of its component; itself if unclustered) and
    * `keep = (doc == canonical)` — downstream consumers inner-join on
    * `keep` or anti-join on the drop set. One left join of the corpus
    * against the (tiny) component-label table; the corpus itself never
    * enters the fixpoint loop. */
  private def q60(spark: SparkSession, dir: String): DataFrame = {
    val labels = ccLabels(spark, dir)
    Tables.documents(spark, dir).select(col("doc_id"), col("source"))
      .join(labels, col("doc_id") === col("id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("lbl"), col("doc_id")).as("canonical_doc"))
      .withColumn("keep", col("canonical_doc") === col("doc_id"))
      .orderBy(col("doc_id"))
  }

  private val q60Sql =
    s"""WITH RECURSIVE
       |$ccLabelsSqlCtes
       |SELECT d.doc_id, d.source,
       |  coalesce(l.lbl, d.doc_id) AS canonical_doc,
       |  coalesce(l.lbl, d.doc_id) = d.doc_id AS keep
       |FROM documents d
       |LEFT JOIN labels l ON l.id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- q70
  /** Dedup observability: the per-source report of q60's decisions —
    * docs kept vs dropped and the drop rate. The number a curation run
    * actually alerts on (a source whose drop rate jumps is either a
    * scraper bug or a spam flood). Rides entirely on the memoized
    * component labels; one groupBy(source). */
  private def q70(spark: SparkSession, dir: String): DataFrame = {
    q60(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"),
        (sum(when(col("keep"), 0L).otherwise(1L)).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("drop_rate"))
      .orderBy(col("source"))
  }

  private val q70Sql =
    s"""WITH RECURSIVE
       |$ccLabelsSqlCtes,
       |decisions AS (
       |  SELECT d.doc_id, d.source,
       |    coalesce(l.lbl, d.doc_id) = d.doc_id AS keep
       |  FROM documents d
       |  LEFT JOIN labels l ON l.id = d.doc_id)
       |SELECT source,
       |  count(*) AS n_docs,
       |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
       |  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS drop_rate
       |FROM decisions
       |GROUP BY source
       |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q69
  /** Incremental dedup — the production ingestion flow: a NEW batch
    * (odd doc_ids, the deterministic stand-in for "today's crawl")
    * deduplicated against the EXISTING corpus (even doc_ids) without
    * recomputing the corpus. Cascade per new doc:
    *   1. exact content match: content-fingerprint equi-join vs the
    *      corpus fingerprint index (what you'd keep materialized);
    *   2. else near-dup: MinHash band join new×old, ≥13/16 signature
    *      agreement (q35's threshold);
    *   3. else unique → admit.
    * Status + the matched corpus doc (min id) per new doc. Only the NEW
    * batch is sketched at ingest time in production; here both sides
    * derive from the same cached feature tables. All joins are
    * new×old equi-joins on fingerprint/band keys — incremental cost
    * scales with the batch, not the corpus. */
  private def q69(spark: SparkSession, dir: String): DataFrame = {
    val fp = contentFpOf(Tables.documents(spark, dir))
    // The shared cached corpus signature (q35's SAME defs — one semantics
    // under the shared cache key), split new/old; banding a filtered
    // signature equals filtering the banded signature.
    val sig = minhashSig(spark, dir)
    incrementalDecisions(
      newFp = fp.filter(col("doc_id") % 2 === 1),
      newSig = sig.filter(col("doc_id") % 2 === 1),
      corpusFp = fp.filter(col("doc_id") % 2 === 0),
      corpusSig = sig.filter(col("doc_id") % 2 === 0))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q72
  /** q69's cascade behind the Bloom membership pre-filter
    * ([[corpusBlooms]] + `graft_bloom_contains`): the batch's
    * fingerprint and band rows are pruned against few-hundred-KB corpus
    * sketches at scan position, BEFORE either join shuffles — the
    * standard two-tier membership design for judging a crawl batch
    * (mostly new content) against a 100 TB corpus. No false negatives ⇒
    * decisions identical to q69; same oracle SQL. */
  private def q72(spark: SparkSession, dir: String): DataFrame = {
    val fp = contentFpOf(Tables.documents(spark, dir))
    val sig = minhashSig(spark, dir)
    val corpusFp = fp.filter(col("doc_id") % 2 === 0)
    val corpusSig = sig.filter(col("doc_id") % 2 === 0)
    // Sketches are memoized per (session, dir) — production materializes
    // them next to the corpus index; a per-run rebuild would charge two
    // extra corpus actions to every probe.
    val blooms = Features.cachedValue(spark, s"$dir#corpusBlooms") {
      corpusBlooms(corpusFp, corpusSig)
    }
    incrementalDecisions(
      newFp = fp.filter(col("doc_id") % 2 === 1),
      newSig = sig.filter(col("doc_id") % 2 === 1),
      corpusFp = corpusFp, corpusSig = corpusSig,
      blooms = Some(blooms))
      .orderBy(col("doc_id"))
  }

  /** The deterministic eval-set selector shared by q73 (the
    * decontamination report) and q78 (the funnel stage that re-applies
    * it): doc_id % EvalSliceMod == 0 is the stand-in benchmark slice.
    * ONE definition — a fork would silently decouple the funnel row
    * from the stage it summarizes. */
  val EvalSliceMod = 17

  // ---------------------------------------------------------------- q73
  /** Benchmark DECONTAMINATION — the canonical pre-training hygiene op:
    * flag every training document sharing a word-3-gram with the eval
    * set, so benchmark passages can be dropped (or the doc quarantined)
    * before training. The standard n-gram-overlap decontamination
    * published with GPT-2/GPT-3-era training corpora, expressed over
    * the engine's shared shingle features.
    *
    * Here the "benchmark" is the deterministic doc_id % 17 == 0 slice of
    * the corpus (the testdata ships no separate eval table); swapping in
    * a real benchmark table changes one filter.
    *
    * Scale posture: a benchmark is small by nature (10³-10⁵ docs), so
    * its hashed-shingle postings are `broadcast()` — the 100 TB training
    * side streams through a broadcast hash join with NO shuffle; output
    * aggregates are partial-aggregable per training doc. The ratio is
    * floored to micro-units (int64) for engine parity. */
  private def q73(spark: SparkSession, dir: String): DataFrame =
    contamScores(spark, dir).orderBy(col("doc_id"))

  /** q73's per-doc score frame, memoized per (session, dir) like the CC
    * labels and funnel flags: q73 presents it and q119's triage
    * re-aggregates it — without the shared stage the dashboard would
    * re-run the whole gate it summarizes. */
  private[graft] def contamScores(spark: SparkSession, dir: String): DataFrame =
    Features.cachedFrame(spark, s"$dir#contamScores") {
      val train = Features.hashedShingles(spark, dir)
        .filter(col("doc_id") % EvalSliceMod =!= 0)
      contamScoresOver(train, evalPostings(spark, dir))
    }

  /** The FROZEN eval-postings artifact `(e_id, h)` q73 joins against —
    * the hashed distinct shingles of the benchmark slice. Exposed so the
    * streaming decontamination gate ([[graft.streaming.DecontamStreams]])
    * ships the SAME artifact to every micro-batch: a benchmark is a
    * fixed, versioned set, so its postings are built once and broadcast,
    * never re-derived from the stream. */
  private[graft] def evalPostings(spark: SparkSession, dir: String): DataFrame =
    Features.hashedShingles(spark, dir)
      .filter(col("doc_id") % EvalSliceMod === 0)
      .select(col("doc_id").as("e_id"), col("h"))

  /** Hashed distinct-shingle postings `(doc_id, h)` for an ARBITRARY
    * documents frame (doc_id, text) — [[Features.hashedShingles]]'
    * derivation without the session cache, for per-micro-batch use where
    * caching a transient batch would only leak blocks. */
  private[graft] def hashedShinglesOver(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(shingles(col("text"))).as("w"))
      .select(col("doc_id"), md5u32(col("w")).as("h"))

  /** q73's per-doc contamination scores — shared verbatim by batch q73
    * and the streaming gate, so stream/batch parity is structural. The
    * eval side is broadcast (benchmarks are 10³–10⁵ docs by nature); the
    * training postings stream through with NO shuffle beyond the per-doc
    * aggregates. */
  private[graft] def contamScoresOver(post: DataFrame,
      evalSide: DataFrame): DataFrame = {
    val sizes = post.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"))
    val hits = post.join(broadcast(evalSide), "h")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("h")).as("n_hits"),
        min(col("e_id")).as("min_eval_doc"))
    hits.join(sizes, "doc_id")
      .select(col("doc_id"), col("n_hits"), col("n_shingles"),
        floor(lit(1000000.0) * col("n_hits").cast("double") /
          col("n_shingles").cast("double")).cast("long").as("ratio_u"),
        col("min_eval_doc"))
  }

  private val q73Sql =
    s"""WITH words AS ($docShinglesSql),
       |hashed AS (SELECT doc_id, ${md5u32Sql("w")} AS h FROM words),
       |ev AS (SELECT doc_id AS e_id, h FROM hashed WHERE doc_id % $EvalSliceMod = 0),
       |train AS (SELECT doc_id, h FROM hashed WHERE doc_id % $EvalSliceMod <> 0),
       |sizes AS (SELECT doc_id, count(*) AS n_shingles FROM train GROUP BY 1),
       |hits AS (
       |  SELECT t.doc_id, count(DISTINCT t.h) AS n_hits,
       |    min(e.e_id) AS min_eval_doc
       |  FROM train t JOIN ev e ON t.h = e.h
       |  GROUP BY 1)
       |SELECT h.doc_id, CAST(n_hits AS BIGINT) AS n_hits,
       |  CAST(s.n_shingles AS BIGINT) AS n_shingles,
       |  CAST(floor(1000000.0 * CAST(n_hits AS DOUBLE) /
       |    CAST(s.n_shingles AS DOUBLE)) AS BIGINT) AS ratio_u,
       |  min_eval_doc
       |FROM hits h JOIN sizes s USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q78
  /** The CURATION FUNNEL — the one-table answer to "what did the
    * pipeline keep, and which stage dropped what": corpus → text dedup
    * (q60's keep) → semantic dedup (q77's keep) → decontamination (q73's
    * flag) → weighted mixing (q75's admit), each stage's survivor count
    * and its drop attribution. The dashboard row a 100 TB curation run
    * reports per snapshot.
    *
    * Everything reuses the memoized stages (text CC labels, semantic CC
    * labels, the shared shingle features) — the funnel itself is one
    * left-join pass to per-doc flags, ONE partial-aggregable aggregate,
    * and an explode of the 5-stage summary from the single result row
    * (no per-stage rescans). */
  /** Per-doc cumulative funnel flags (source, k1..k4) — the shared base
    * of the corpus-level funnel (q78) and the per-source breakdown
    * (q84). ONE definition: both reports must describe the SAME
    * pipeline run.
    *
    * Memoized as a LOCALCHECKPOINT (not a plain persist): the assembled
    * plan nests every upstream stage's full lineage (three cached label
    * tables, each wrapping its own AQE-planned subtree), and executing
    * any query over that InMemoryRelation re-walks the whole embedded
    * tree on the DRIVER — measured ~3 s of pure plan processing per
    * warm run against 8 ms of actual task work. The checkpoint cuts
    * the frame to a LogicalRDD leaf: the one-time materialization cost
    * is identical, and every funnel query afterwards plans against a
    * 5-column leaf. Freed by `Features.clear` via `freeFrame` (plain
    * `unpersist` is a no-op for checkpoint-backed frames). */
  private def funnelFlags(spark: SparkSession, dir: String): DataFrame =
    Features.cachedFrame(spark, s"$dir#funnelFlags") {
      funnelFlagsUncached(spark, dir).localCheckpoint()
    }

  private def funnelFlagsUncached(spark: SparkSession, dir: String): DataFrame =
    funnelFlagsOver(
      Tables.documents(spark, dir).select(col("doc_id"), col("source")),
      spark, dir)
      .select(col("doc_id"), col("source"), col("k1"), col("k2"),
        col("k3"), col("k4"))

  /** The funnel keep-chain stamped onto an arbitrary documents frame
    * (must carry doc_id + source): `rows` plus k1..k4. All three stage
    * tables are BROADCAST — they hold only dup-cluster members /
    * contaminated ids, small by construction at any corpus size — so
    * the input streams through with NO shuffle, which is what lets
    * [[graft.Curate]] run this over full document payloads and write
    * survivors without ever shuffling text bytes. */
  private[graft] def funnelFlagsOver(rows: DataFrame,
      spark: SparkSession, dir: String): DataFrame = {
    val tLbl = ccLabels(spark, dir)
      .select(col("id").as("t_id"), col("lbl").as("t_lbl"))
    val sLbl = Similarity.embCcLabels(spark, dir)
      .select(col("id").as("s_id"), col("lbl").as("s_lbl"))
    // Memoized like the label tables: the contaminated-id set was the
    // one funnel stage rebuilt per run (two shuffles over the shingle
    // features each time) — materialize it once per (session, dir).
    val contaminated = Features.cachedFrame(spark, s"$dir#contamIds") {
      val post = Features.hashedShingles(spark, dir)
      post.filter(col("doc_id") % EvalSliceMod =!= 0)
        .join(broadcast(post.filter(col("doc_id") % EvalSliceMod === 0)
          .select(col("h")).distinct()), "h")
        .select(col("doc_id").as("c_id")).distinct()
    }
    // q75's mixing rule, by reference — ONE definition (TextAnalysis).
    val admit = TextAnalysis.mixAdmit(TextAnalysis.mixWMilli)

    // Cumulative keep chain: each stage filters what survived the last.
    rows
      .join(broadcast(tLbl), col("doc_id") === col("t_id"), "left")
      .join(broadcast(sLbl), col("doc_id") === col("s_id"), "left")
      .join(broadcast(contaminated), col("doc_id") === col("c_id"), "left")
      .withColumn("k1",
        coalesce(col("t_lbl"), col("doc_id")) === col("doc_id"))
      .withColumn("s_keep",
        coalesce(col("s_lbl"), col("doc_id")) === col("doc_id"))
      .withColumn("k2", col("k1") && col("s_keep"))
      .withColumn("k3", col("k2") && col("c_id").isNull)
      .withColumn("k4", col("k3") && admit)
      .drop("t_id", "t_lbl", "s_id", "s_lbl", "c_id", "s_keep")
  }

  /** [[funnelFlagsOver]] under the standing deletion set ([[DeleteMod]])
    * — the flags AS IF the deleted documents never existed, at the
    * decision-table level: both label tables drop their deleted rows
    * and each cluster's canonical re-elects to the minimum SURVIVING
    * id (exactly q140's election rule, applied to the text AND
    * semantic cluster tables), so a cluster whose keeper is tombstoned
    * ships its re-elected twin instead of losing the content.
    * `rows` must already exclude the deleted documents themselves —
    * the caller's hard compliance filter; this function only repairs
    * the DERIVED decisions.
    *
    * Caveat (documented, deliberate): components here are the
    * materialized label table's equivalence classes. Removing a
    * cut-vertex document could in principle split the underlying pair
    * graph; the decision table treats the class as content identity
    * (the q60 posture), and the next full CC build re-derives labels
    * from surviving pairs. */
  private[graft] def funnelFlagsTombstonedOver(rows: DataFrame,
      spark: SparkSession, dir: String): DataFrame = {
    def reElected(labels: DataFrame): DataFrame = {
      val surv = labels.filter(col("id") % DeleteMod =!= 0)
      surv.join(surv.groupBy(col("lbl")).agg(min(col("id")).as("canon")),
          "lbl")
        .select(col("id"), col("canon"))
    }
    val tLbl = reElected(ccLabels(spark, dir))
      .select(col("id").as("t_id"), col("canon").as("t_canon"))
    val sLbl = reElected(Similarity.embCcLabels(spark, dir))
      .select(col("id").as("s_id"), col("canon").as("s_canon"))
    val contaminated = Features.cachedFrame(spark, s"$dir#contamIds") {
      val post = Features.hashedShingles(spark, dir)
      post.filter(col("doc_id") % EvalSliceMod =!= 0)
        .join(broadcast(post.filter(col("doc_id") % EvalSliceMod === 0)
          .select(col("h")).distinct()), "h")
        .select(col("doc_id").as("c_id")).distinct()
    }
    val admit = TextAnalysis.mixAdmit(TextAnalysis.mixWMilli)
    rows
      .join(broadcast(tLbl), col("doc_id") === col("t_id"), "left")
      .join(broadcast(sLbl), col("doc_id") === col("s_id"), "left")
      .join(broadcast(contaminated), col("doc_id") === col("c_id"), "left")
      .withColumn("k1",
        coalesce(col("t_canon"), col("doc_id")) === col("doc_id"))
      .withColumn("s_keep",
        coalesce(col("s_canon"), col("doc_id")) === col("doc_id"))
      .withColumn("k2", col("k1") && col("s_keep"))
      .withColumn("k3", col("k2") && col("c_id").isNull)
      .withColumn("k4", col("k3") && admit)
      .drop("t_id", "t_canon", "s_id", "s_canon", "c_id", "s_keep")
  }

  private def cntTrue(c: Column) = sum(when(c, 1L).otherwise(0L))

  private def q78(spark: SparkSession, dir: String): DataFrame = {
    def cnt(c: Column) = cntTrue(c)
    val a = funnelFlags(spark, dir).agg(
      count(lit(1)).as("n0"), cnt(col("k1")).as("n1"),
      cnt(col("k2")).as("n2"), cnt(col("k3")).as("n3"), cnt(col("k4")).as("n4"))
    def stageRow(name: String, n: Column, prev: Column) =
      struct(lit(name).as("stage"), n.as("n_docs"), (prev - n).as("n_dropped"))
    a.select(explode(array(
        stageRow("0_corpus", col("n0"), col("n0")),
        stageRow("1_text_dedup", col("n1"), col("n0")),
        stageRow("2_semantic_dedup", col("n2"), col("n1")),
        stageRow("3_decontaminated", col("n3"), col("n2")),
        stageRow("4_mixed", col("n4"), col("n3")))).as("s"))
      .select(col("s.stage").as("stage"), col("s.n_docs").as("n_docs"),
        col("s.n_dropped").as("n_dropped"))
      .orderBy(col("stage"))
  }

  // ---------------------------------------------------------------- q96
  /** MINHASH SKETCH-FIDELITY AUDIT — the sketch-honesty companion of
    * q51 (HLL vs exact distinct) and q90 (quantile sketch vs exact
    * anchor), for the sketch the whole dedup cascade trusts: over q35's
    * verified candidate pairs, compare the MinHash Jaccard ESTIMATE
    * (matching minima / k) against the EXACT shingle-set Jaccard, and
    * report the error distribution plus how many pairs sit within the
    * 2σ band (σ = √(J(1−J)/k) ≤ 0.125 at k = 16 ⇒ 2σ ≤ 0.25). A
    * drifting permutation family or a broken banding join shows up here
    * as a mean error jump long before downstream dedup quality decays
    * visibly. Fully engine-replayable (the md5-derived sketch is
    * deterministic in both engines), so the oracle hashes real numbers,
    * not a pinned TRUE.
    *
    * Scale posture: exact verification ONLY on the banded candidates
    * (q35's own cost shape, shared feature tables); the audit adds one
    * join to the cached shingle arrays and one 1-row aggregate. */
  private def q96(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minhashVerifiedPairs(minhashSig(spark, dir))
    val sh = Features.shingleSets(spark, dir)
    val sa = sh.toDF("a_doc", "a_ss")
    val sb = sh.toDF("b_doc", "b_ss")
    pairs
      .join(sa, col("doc_a") === col("a_doc"))
      .join(sb, col("doc_b") === col("b_doc"))
      .withColumn("n_common",
        size(array_intersect(col("a_ss"), col("b_ss"))).cast("long"))
      .withColumn("n_union",
        (size(col("a_ss")) + size(col("b_ss"))).cast("long") - col("n_common"))
      .withColumn("est_u",
        floor(lit(1000000.0) * col("n_matches").cast(DoubleType) /
          lit(MinHashK.toDouble)).cast("long"))
      .withColumn("exact_u",
        floor(lit(1000000.0) * col("n_common").cast(DoubleType) /
          col("n_union").cast(DoubleType)).cast("long"))
      .withColumn("err_u", abs(col("est_u") - col("exact_u")))
      .agg(count(lit(1)).as("n_pairs"),
        floor(sum(col("err_u")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).cast("long").as("mean_abs_err_u"),
        max(col("err_u")).as("max_abs_err_u"),
        sum(when(col("err_u") <= 250000L, 1L).otherwise(0L))
          .as("n_within_2sigma"))
  }

  private lazy val q96Sql = {
    val mins = (0 until MinHashK)
      .map(i => s"min(${permSql(i, "h")}) AS m$i").mkString(",\n    ")
    val bandSelects = (0 until LshBands).map { b =>
      val ms = (0 until LshRows).map(r => s"m${b * LshRows + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws(',', $ms)) AS bh FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    val matches = (0 until MinHashK)
      .map(i => s"CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH sh AS (
       |  SELECT doc_id, ${shinglesSql("text")} AS ss
       |  FROM documents),
       |hashed AS (SELECT doc_id, ${md5u32Sql("w")} AS h
       |           FROM (SELECT doc_id, unnest(ss) AS w FROM sh)),
       |sig AS (
       |  SELECT doc_id,
       |    $mins
       |  FROM hashed GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2),
       |verified AS (
       |  SELECT doc_a, doc_b, ($matches) AS n_matches
       |  FROM cand
       |  JOIN sig sa ON sa.doc_id = doc_a
       |  JOIN sig sb ON sb.doc_id = doc_b
       |  WHERE ($matches) >= $MinHashMatchMin),
       |scored AS (
       |  SELECT
       |    CAST(floor(1000000.0 * CAST(n_matches AS DOUBLE) /
       |      ${MinHashK.toDouble}) AS BIGINT) AS est_u,
       |    CAST(floor(1000000.0 * CAST(len(list_intersect(a.ss, b.ss)) AS DOUBLE) /
       |      CAST(len(a.ss) + len(b.ss) - len(list_intersect(a.ss, b.ss))
       |        AS DOUBLE)) AS BIGINT) AS exact_u
       |  FROM verified
       |  JOIN sh a ON a.doc_id = doc_a
       |  JOIN sh b ON b.doc_id = doc_b)
       |SELECT count(*) AS n_pairs,
       |  CAST(floor(CAST(sum(abs(est_u - exact_u)) AS DOUBLE) /
       |    CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_abs_err_u,
       |  CAST(max(abs(est_u - exact_u)) AS BIGINT) AS max_abs_err_u,
       |  CAST(sum(CASE WHEN abs(est_u - exact_u) <= 250000 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_within_2sigma
       |FROM scored""".stripMargin
  }

  // ---------------------------------------------------------------- q98
  /** SIMHASH SKETCH-FIDELITY AUDIT — q96's honesty check for the OTHER
    * sketch. q96 audits MinHash's Jaccard estimate against exact
    * Jaccard; this audits SimHash's angle estimate against exact
    * cosine, over exactly the hamming ≤ 3 pairs the production sketch
    * (q36) ships. Sign-LSH theory: P(bit differs) = θ/π, so
    * est cos = cos(π · hamming / 32). Exact cosine over the binary
    * shingle-set vectors SimHash fingerprints: |A∩B| / √(|A|·|B|).
    *
    * Float parity: `cos` is NOT guaranteed bit-identical across libm
    * implementations, so the 4 possible estimates (hamming ∈ 0..3) are
    * computed ONCE on the JVM and interpolated into BOTH engines as
    * int64 micro-unit literals ([[SimHashEstCosU]]); the exact side is
    * one correctly-rounded `sqrt` + one division on identical operands.
    *
    * Tolerance: with 32 hyperplanes and p̂ = h/32 ≤ 3/32, 2σ on the
    * hamming fraction maps to ≲ 0.14 cosine; [[SimHashCosTolU]] = 0.1
    * is the round in-engine bound (measured max error at sf0.001-0.1
    * is ~0.027 — see the audit row itself).
    *
    * Scale posture: rides q36's banded candidates (never all-pairs);
    * the shingle-set join touches only verified pairs; output is one
    * aggregate row. */
  /** Sign-LSH cosine estimates per hamming count, width-aware: with
    * `bits` hyperplanes, P(bit differs) = θ/π, so est cos =
    * cos(π·h/bits). The 32-bit table is the oracle-pinned one; q98's
    * Spark side follows [[SimHashBitsConf]] so the fidelity audit
    * re-scores whichever sketch is LIVE (at 64 bits the same h maps
    * to a tighter estimate — h=3 ⇒ ≈0.989 vs ≈0.957). */
  private[graft] def simHashEstCosU(bits: Int): IndexedSeq[Long] =
    (0 to 3).map(h =>
      math.floor(1e6 * math.cos(math.Pi * h / bits)).toLong)
  private[graft] val SimHashEstCosU: IndexedSeq[Long] =
    simHashEstCosU(SimHashBits)
  val SimHashCosTolU = 100000L

  private def q98(spark: SparkSession, dir: String): DataFrame = {
    val pairs = simhashVerifiedPairs(spark, dir)
    val sh = Features.shingleSets(spark, dir)
    val sa = sh.toDF("a_doc", "a_ss")
    val sb = sh.toDF("b_doc", "b_ss")
    val est = simHashEstCosU(simhashBits(spark)).zipWithIndex
      .foldLeft(lit(0L)) { case (acc, (v, h)) =>
        when(col("hamming") === h, lit(v)).otherwise(acc)
      }
    pairs
      .join(sa, col("doc_a") === col("a_doc"))
      .join(sb, col("doc_b") === col("b_doc"))
      .withColumn("n_common",
        size(array_intersect(col("a_ss"), col("b_ss"))).cast("long"))
      .withColumn("est_cos_u", est)
      .withColumn("exact_cos_u",
        floor(lit(1000000.0) * col("n_common").cast(DoubleType) /
          sqrt((size(col("a_ss")).cast("long") *
            size(col("b_ss")).cast("long")).cast(DoubleType))).cast("long"))
      .withColumn("err_u", abs(col("est_cos_u") - col("exact_cos_u")))
      .agg(count(lit(1)).as("n_pairs"),
        floor(sum(col("err_u")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).cast("long").as("mean_abs_err_u"),
        max(col("err_u")).as("max_abs_err_u"),
        sum(when(col("err_u") <= SimHashCosTolU, 1L).otherwise(0L))
          .as("n_within_tol"))
  }

  private lazy val q98Sql = {
    val bitSums = (0 until SimHashBits)
      .map(j => s"CAST(sum(${simBitSql(j, "h")}) AS BIGINT) AS s$j")
      .mkString(",\n    ")
    val simhash = (0 until SimHashBits)
      .map(j => s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    val bandSelects = (0 until 4).map { b =>
      s"SELECT doc_id, simhash, $b AS band, (simhash >> ${b * SimHashBandBits}) & 255 AS bv FROM fp"
    }.mkString("\n  UNION ALL\n  ")
    val estCase = "CASE hamming " + SimHashEstCosU.zipWithIndex
      .map { case (v, h) => s"WHEN $h THEN $v" }.mkString(" ") + " END"
    s"""WITH sh AS (
       |  SELECT doc_id, ${shinglesSql("text")} AS ss
       |  FROM documents),
       |hashed AS (SELECT doc_id, ${md5u32Sql("w")} AS h
       |           FROM (SELECT doc_id, unnest(ss) AS w FROM sh)),
       |bits AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM hashed GROUP BY doc_id),
       |fp AS (SELECT doc_id, CAST($simhash AS BIGINT) AS simhash FROM bits),
       |banded AS (
       |  $bandSelects),
       |pairs AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |    CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
       |  FROM banded x JOIN banded y
       |    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
       |  WHERE bit_count(xor(x.simhash, y.simhash)) <= 3),
       |scored AS (
       |  SELECT
       |    CAST($estCase AS BIGINT) AS est_cos_u,
       |    CAST(floor(1000000.0 * CAST(len(list_intersect(a.ss, b.ss)) AS DOUBLE) /
       |      sqrt(CAST(CAST(len(a.ss) AS BIGINT) * CAST(len(b.ss) AS BIGINT)
       |        AS DOUBLE))) AS BIGINT) AS exact_cos_u
       |  FROM pairs
       |  JOIN sh a ON a.doc_id = doc_a
       |  JOIN sh b ON b.doc_id = doc_b)
       |SELECT count(*) AS n_pairs,
       |  CAST(floor(CAST(sum(abs(est_cos_u - exact_cos_u)) AS DOUBLE) /
       |    CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_abs_err_u,
       |  CAST(max(abs(est_cos_u - exact_cos_u)) AS BIGINT) AS max_abs_err_u,
       |  CAST(sum(CASE WHEN abs(est_cos_u - exact_cos_u) <= $SimHashCosTolU
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_within_tol
       |FROM scored""".stripMargin
  }

  // ---------------------------------------------------------------- q92
  /** EXTENDED CURATION FUNNEL — q78's survival chain with the composite
    * QUALITY GATE (q89) as its first stage: corpus → quality → text
    * dedup → semantic dedup → decontamination → mixing. Real pipelines
    * gate quality BEFORE dedup (no point fingerprinting documents the
    * length/repetition/LM gates will discard), and because every stage
    * flag is an independent per-doc predicate, prefixing the chain
    * composes by conjunction — q78 stays untouched as the 5-stage
    * report.
    *
    * Conjunction implies REPRESENTATIVE LOSS: dedup flags are computed
    * on the FULL corpus, so if a dup cluster's keeper (min doc_id) is
    * quality-rejected, its duplicates still carry their dedup-drop
    * flag and ALL copies of that content leave the corpus — no
    * surviving twin is re-elected keeper. Deliberate: near-duplicates
    * of gate-rejected content are the same rejected content, and
    * independent flags are what keep each stage's drop count
    * meaningful and the stage tables memoizable (see [[graft.Curate]]
    * for the compose-in-the-other-order alternative).
    *
    * Scale posture: identical to q78 plus ONE broadcast left join — the
    * quality REJECT set is broadcast (a healthy corpus rejects a few
    * percent; broadcasting the admits would ship nearly the corpus),
    * memoized per (session, dir) like the funnel's other stage tables. */
  private[graft] def qualityRejects(spark: SparkSession, dir: String): DataFrame =
    Features.cachedFrame(spark, s"$dir#qualityRejects") {
      TextAnalysis.corpusQualityDecisions(spark, dir)
        .filter(!col("admit")).select(col("doc_id").as("q_id"))
        .localCheckpoint()
    }

  private def q92(spark: SparkSession, dir: String): DataFrame = {
    def cnt(c: Column) = cntTrue(c)
    val a = funnelFlags(spark, dir)
      .join(broadcast(qualityRejects(spark, dir)),
        col("doc_id") === col("q_id"), "left")
      .withColumn("k0", col("q_id").isNull)
      .agg(count(lit(1)).as("n0"), cnt(col("k0")).as("nq"),
        cnt(col("k0") && col("k1")).as("n1"),
        cnt(col("k0") && col("k2")).as("n2"),
        cnt(col("k0") && col("k3")).as("n3"),
        cnt(col("k0") && col("k4")).as("n4"))
    def stageRow(name: String, n: Column, prev: Column) =
      struct(lit(name).as("stage"), n.as("n_docs"), (prev - n).as("n_dropped"))
    a.select(explode(array(
        stageRow("0_corpus", col("n0"), col("n0")),
        stageRow("1_quality", col("nq"), col("n0")),
        stageRow("2_text_dedup", col("n1"), col("nq")),
        stageRow("3_semantic_dedup", col("n2"), col("n1")),
        stageRow("4_decontaminated", col("n3"), col("n2")),
        stageRow("5_mixed", col("n4"), col("n3")))).as("s"))
      .select(col("s.stage").as("stage"), col("s.n_docs").as("n_docs"),
        col("s.n_dropped").as("n_dropped"))
      .orderBy(col("stage"))
  }

  private val q92Sql = {
    // funnelFlagsCtes (flags) + q89's decision CTEs (dec) — disjoint
    // names by construction; qrej mirrors [[qualityRejects]].
    s"""WITH RECURSIVE
       |$funnelFlagsCtes,
       |${TextAnalysis.qualityDecisionCtes},
       |qrej AS (SELECT doc_id AS q_id FROM dec WHERE reason <> 'admit'),
       |f2 AS (
       |  SELECT f.*, q.q_id IS NULL AS k0
       |  FROM flags f LEFT JOIN qrej q ON q.q_id = f.doc_id),
       |agg AS (
       |  SELECT count(*) AS n0,
       |    CAST(sum(CASE WHEN k0 THEN 1 ELSE 0 END) AS BIGINT) AS nq,
       |    CAST(sum(CASE WHEN k0 AND k1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN k0 AND k2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |    CAST(sum(CASE WHEN k0 AND k3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
       |    CAST(sum(CASE WHEN k0 AND k4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
       |  FROM f2)
       |SELECT stage, n_docs, n_dropped FROM (
       |  SELECT '0_corpus' AS stage, n0 AS n_docs, 0 AS n_dropped FROM agg
       |  UNION ALL
       |  SELECT '1_quality', nq, n0 - nq FROM agg
       |  UNION ALL
       |  SELECT '2_text_dedup', n1, nq - n1 FROM agg
       |  UNION ALL
       |  SELECT '3_semantic_dedup', n2, n1 - n2 FROM agg
       |  UNION ALL
       |  SELECT '4_decontaminated', n3, n2 - n3 FROM agg
       |  UNION ALL
       |  SELECT '5_mixed', n4, n3 - n4 FROM agg)
       |ORDER BY stage""".stripMargin
  }

  // ---------------------------------------------------------------- q218
  /** DUPLICATION × QUALITY INTERACTION — per source, the contingency
    * between near-dup membership (q35's components — `ccLabels`) and
    * the composite quality gate's verdict (q89), with the exact phi
    * coefficient: "are my duplicates also my junk?" A strongly
    * positive phi says dedup and the quality gate are spending their
    * budgets on the SAME documents (one of the two stages is nearly
    * free to drop for that feed); phi ≈ 0 says they prune
    * independently (both earn their keep); negative phi marks feeds
    * whose duplicated content is its GOOD content (syndicated quality
    * articles) — the one case where dedup-before-quality changes
    * which text survives. Composes the two memoized stages the
    * curation funnel (q92) already chains, into the per-feed
    * diagnostic the funnel's corpus-level counts hide.
    *
    * Determinism: all four cells exact int64; phi one micro-floored
    * double over exact operands (cell products fit int64 through
    * ~3·10⁹ docs/source — past that, the same expression in DECIMAL;
    * documented headroom); degenerate marginals (a feed entirely
    * dup or entirely admitted) report phi 0 rather than 0/0.
    *
    * Scale posture: rides the session-memoized `ccLabels` (pairs-
    * bounded) and the q89 decision frame; the membership probe is a
    * left join against the LABELS-sized id set; the report is
    * sources-sized. */
  private def q218(spark: SparkSession, dir: String): DataFrame = {
    val dec = TextAnalysis.corpusQualityDecisions(spark, dir)
      .select(col("doc_id"), col("source"), col("admit"))
    val dupIds = ccLabels(spark, dir).select(col("id")).distinct()
    val cells = dec
      .join(dupIds, dec("doc_id") === dupIds("id"), "left")
      .withColumn("is_dup", col("id").isNotNull)
      .groupBy(col("source"))
      .agg(
        sum(when(col("is_dup") && !col("admit"), 1L).otherwise(0L))
          .as("dup_reject"),
        sum(when(col("is_dup") && col("admit"), 1L).otherwise(0L))
          .as("dup_admit"),
        sum(when(!col("is_dup") && !col("admit"), 1L).otherwise(0L))
          .as("uniq_reject"),
        sum(when(!col("is_dup") && col("admit"), 1L).otherwise(0L))
          .as("uniq_admit"))
    val (a, b, c, d) = (col("dup_reject"), col("dup_admit"),
      col("uniq_reject"), col("uniq_admit"))
    cells
      .withColumn("phi_u",
        when((a + b) === 0L || (c + d) === 0L ||
            (a + c) === 0L || (b + d) === 0L, lit(0L))
          .otherwise(floor(lit(1000000.0) *
            (a * d - b * c).cast(DoubleType) /
            sqrt(((a + b) * (c + d)).cast(DoubleType) *
              ((a + c) * (b + d)).cast(DoubleType))).cast("long")))
      .select(col("source"), a, b, c, d, col("phi_u"))
      .orderBy(col("source"))
  }

  private lazy val q218Sql =
    s"""WITH RECURSIVE
       |$ccLabelsSqlCtes,
       |${TextAnalysis.qualityDecisionCtes},
       |dup AS (SELECT DISTINCT id FROM labels),
       |cells AS (
       |  SELECT d.source,
       |    CAST(sum(CASE WHEN u.id IS NOT NULL AND d.reason <> 'admit'
       |      THEN 1 ELSE 0 END) AS BIGINT) AS dup_reject,
       |    CAST(sum(CASE WHEN u.id IS NOT NULL AND d.reason = 'admit'
       |      THEN 1 ELSE 0 END) AS BIGINT) AS dup_admit,
       |    CAST(sum(CASE WHEN u.id IS NULL AND d.reason <> 'admit'
       |      THEN 1 ELSE 0 END) AS BIGINT) AS uniq_reject,
       |    CAST(sum(CASE WHEN u.id IS NULL AND d.reason = 'admit'
       |      THEN 1 ELSE 0 END) AS BIGINT) AS uniq_admit
       |  FROM dec d LEFT JOIN dup u ON d.doc_id = u.id
       |  GROUP BY 1)
       |SELECT source, dup_reject, dup_admit, uniq_reject, uniq_admit,
       |  CASE WHEN dup_reject + dup_admit = 0 OR uniq_reject + uniq_admit = 0
       |         OR dup_reject + uniq_reject = 0 OR dup_admit + uniq_admit = 0
       |    THEN 0
       |    ELSE CAST(floor(1000000.0 *
       |      CAST(dup_reject * uniq_admit - dup_admit * uniq_reject
       |        AS DOUBLE) /
       |      sqrt(CAST((dup_reject + dup_admit) * (uniq_reject + uniq_admit)
       |          AS DOUBLE) *
       |        CAST((dup_reject + uniq_reject) * (dup_admit + uniq_admit)
       |          AS DOUBLE))) AS BIGINT) END AS phi_u
       |FROM cells
       |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q220
  /** DUPLICATION TREND OVER INGEST ORDER — per source, the near-dup
    * membership rate across ingest-order deciles (doc_id order, the
    * append log): a feed whose late deciles dup-rate climbs is
    * re-crawling itself — q110's histogram says HOW MUCH duplication,
    * q122 WHOSE content it was, this says WHEN it started, which is
    * what decides whether to cut a feed or just cap its refresh rate.
    *
    * Determinism: deciles by `((rnk−1)·10) div n` over the per-source
    * (doc_id) total order; counts int64; rates micro floor-div.
    *
    * Scale posture: rides the session-memoized `ccLabels` (the
    * membership probe is a left join against the labels-sized id
    * set); the decile cut is [[Features.ingestDecile]] — exact
    * per-source rank window by default (oracle-pinned; q125
    * low-cardinality caveat), the broadcast `percentile_approx`
    * thresholds under `spark.graft.quantiles.mode=approx` (no rank
    * window at any feed size); the report is ≤ 10·|sources| rows. */
  private def q220(spark: SparkSession, dir: String): DataFrame = {
    val ranked = Features.ingestDecile(
      Tables.documents(spark, dir).select(col("source"), col("doc_id")))
    val dupIds = ccLabels(spark, dir).select(col("id")).distinct()
    ranked.join(dupIds, ranked("doc_id") === dupIds("id"), "left")
      .withColumn("is_dup", col("id").isNotNull)
      .groupBy(col("source"), col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_rate_u", expr("(1000000 * n_dup) div n_docs"))
      .orderBy(col("source"), col("decile"))
  }

  private lazy val q220Sql =
    s"""WITH RECURSIVE
       |$ccLabelsSqlCtes,
       |dup AS (SELECT DISTINCT id FROM labels),
       |ranked AS (
       |  SELECT source, doc_id,
       |    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
       |      AS BIGINT) AS rnk,
       |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
       |  FROM documents)
       |SELECT r.source, ((r.rnk - 1) * 10) // r.n_src AS decile,
       |  count(*) AS n_docs,
       |  CAST(sum(CASE WHEN u.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup,
       |  (1000000 * CAST(sum(CASE WHEN u.id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT)) // count(*) AS dup_rate_u
       |FROM ranked r LEFT JOIN dup u ON r.doc_id = u.id
       |GROUP BY 1, 2
       |ORDER BY source, decile""".stripMargin

  // ---------------------------------------------------------------- q225
  /** DUP-CLUSTER SOURCE-SPAN HISTOGRAM — do near-dup clusters stay
    * inside one feed or cross feeds? Per cluster the distinct-source
    * span, reported as a histogram: span-1 clusters are a feed
    * re-crawling ITSELF (fix the crawler); multi-source clusters are
    * syndication/mirroring (a licensing/canonicalization question —
    * q82 prices WHICH pair overlaps, this the population split that
    * decides which playbook applies).
    *
    * Determinism: exact counts; cluster membership from the memoized
    * CC labels (q56's min-label semantics).
    *
    * Scale posture: one labels-sized join against the documents
    * projection, two stacked partial-aggregable aggregates, a
    * <=|sources|-row histogram. */
  private def q225(spark: SparkSession, dir: String): DataFrame = {
    val labeled = ccLabels(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("source")),
        col("id") === col("doc_id"))
    val perCluster = labeled.groupBy(col("lbl"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"))
    perCluster.groupBy(col("n_sources"))
      .agg(count(lit(1)).as("n_clusters"), sum(col("n_docs")).as("n_docs"))
      .orderBy(col("n_sources"))
  }

  private lazy val q225Sql =
    s"""WITH RECURSIVE
       |$ccLabelsSqlCtes,
       |per_cluster AS (
       |  SELECT l.lbl, count(*) AS n_docs,
       |    CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources
       |  FROM labels l JOIN documents d ON l.id = d.doc_id
       |  GROUP BY 1)
       |SELECT n_sources, count(*) AS n_clusters,
       |  CAST(sum(n_docs) AS BIGINT) AS n_docs
       |FROM per_cluster GROUP BY 1
       |ORDER BY n_sources""".stripMargin

  // ---------------------------------------------------------------- q228
  /** NEAR-DUP PAIR DISTANCE HISTOGRAM — how far apart (in ingest
    * order) near-dup pairs sit: |doc_a − doc_b| bucketed by power of
    * two. Adjacent dups (distance 1-8) are crawler stutter /
    * double-fetch; mid-range the same feed re-crawling itself
    * (q220's WHEN at pair grain); far pairs independent syndication.
    * The bucket profile decides whether a cheap sliding-window dedup
    * (compare only nearby ids — O(n·w)) would catch most duplication
    * before the full banded pass pays for the tail.
    *
    * Determinism: exact id distance; power-of-two buckets via the
    * BINARY-STRING length (bit length − 1 == floor(log2), exact for
    * any positive int64 — a float log2 rounds ambiguously at exact
    * powers of two across libm implementations).
    *
    * Scale posture: one projection + partial-aggregable histogram
    * over q35's banding-bounded verified pairs; ≤ 63 rows. */
  private def q228(spark: SparkSession, dir: String): DataFrame = {
    val pairs = q35(spark, dir).select(col("doc_a"), col("doc_b"))
    pairs
      .withColumn("dist", col("doc_b") - col("doc_a"))
      .withColumn("bucket",
        (length(conv(col("dist"), 10, 2)) - 1).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"), min(col("dist")).as("min_dist"),
        max(col("dist")).as("max_dist"))
      .orderBy(col("bucket"))
  }

  private lazy val q228Sql =
    s"""WITH pairs AS (SELECT doc_a, doc_b FROM ($q35Sql))
       |SELECT CAST(length(to_base(doc_b - doc_a, 2)) - 1 AS BIGINT)
       |    AS bucket,
       |  count(*) AS n_pairs,
       |  CAST(min(doc_b - doc_a) AS BIGINT) AS min_dist,
       |  CAST(max(doc_b - doc_a) AS BIGINT) AS max_dist
       |FROM pairs GROUP BY 1
       |ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q84
  /** PER-SOURCE CURATION FUNNEL — q78's survival chain broken out by
    * source: for each source, how many docs survive text dedup,
    * semantic dedup, decontamination, and mixing, plus the end-to-end
    * survival rate in micro-units. The question q78's corpus totals
    * can't answer: WHICH feed is hemorrhaging at WHICH stage (a source
    * whose decontamination survival craters is scraping the benchmark
    * site; one that craters at text dedup is re-crawling itself).
    *
    * Rides the identical memoized stages as q78 via the shared
    * [[funnelFlags]] — the two reports are the same pipeline run by
    * construction, and the marginal cost over q78 is grouping by
    * source (≤ 10² cells) instead of globally. */
  private def q84(spark: SparkSession, dir: String): DataFrame = {
    funnelFlags(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_corpus"),
        cntTrue(col("k1")).as("n_text_dedup"),
        cntTrue(col("k2")).as("n_semantic"),
        cntTrue(col("k3")).as("n_decontaminated"),
        cntTrue(col("k4")).as("n_mixed"))
      .withColumn("survival_u",
        floor(lit(1000000.0) * col("n_mixed").cast(DoubleType) /
          col("n_corpus").cast(DoubleType)).cast("long"))
      .orderBy(col("source"))
  }

  private val q84Sql =
    s"""WITH RECURSIVE
       |$funnelFlagsCtes
       |SELECT source,
       |  count(*) AS n_corpus,
       |  CAST(sum(CASE WHEN k1 THEN 1 ELSE 0 END) AS BIGINT) AS n_text_dedup,
       |  CAST(sum(CASE WHEN k2 THEN 1 ELSE 0 END) AS BIGINT) AS n_semantic,
       |  CAST(sum(CASE WHEN k3 THEN 1 ELSE 0 END) AS BIGINT) AS n_decontaminated,
       |  CAST(sum(CASE WHEN k4 THEN 1 ELSE 0 END) AS BIGINT) AS n_mixed,
       |  CAST(floor(1000000.0 *
       |    CAST(sum(CASE WHEN k4 THEN 1 ELSE 0 END) AS DOUBLE) /
       |    CAST(count(*) AS DOUBLE)) AS BIGINT) AS survival_u
       |FROM flags
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** Shared CTE chain ending in `flags(source, k1..k4)` — the SQL twin
    * of [[funnelFlags]], consumed by both q78Sql and q84Sql. */
  private lazy val funnelFlagsCtes: String = {
    // Top-level CTE names must be unique: the text-dedup closure's
    // names get a t_ prefix (inner nested WITHs are paren-scoped and
    // unaffected); the semantic closure is built fresh with s_ names.
    val tCtes = ccLabelsSqlCtes
      .replaceAll("\\b(pairs|edges|reach|labels)\\b", "t_$1")
    s"""$tCtes,
       |s_pairs AS (SELECT a_id, b_id FROM (${Similarity.semNearDupPairsSql})),
       |s_edges AS (
       |  SELECT a_id AS src, b_id AS dst FROM s_pairs
       |  UNION ALL
       |  SELECT b_id AS src, a_id AS dst FROM s_pairs),
       |s_reach(id, lbl) AS (
       |  SELECT src, src FROM s_edges
       |  UNION
       |  SELECT e.src, r.lbl FROM s_edges e JOIN s_reach r ON e.dst = r.id),
       |s_labels AS (SELECT id, min(lbl) AS lbl FROM s_reach GROUP BY id),
       |c_words AS ($docShinglesSql),
       |c_hashed AS (SELECT doc_id, ${md5u32Sql("w")} AS h FROM c_words),
       |contaminated AS (
       |  SELECT DISTINCT t.doc_id AS c_id
       |  FROM c_hashed t JOIN (SELECT DISTINCT h FROM c_hashed
       |                        WHERE doc_id % $EvalSliceMod = 0) e ON t.h = e.h
       |  WHERE t.doc_id % $EvalSliceMod <> 0),
       |flags AS (
       |  SELECT d.doc_id, d.source,
       |    coalesce(tl.lbl, d.doc_id) = d.doc_id AS k1,
       |    coalesce(tl.lbl, d.doc_id) = d.doc_id
       |      AND coalesce(sl.lbl, d.doc_id) = d.doc_id AS k2,
       |    coalesce(tl.lbl, d.doc_id) = d.doc_id
       |      AND coalesce(sl.lbl, d.doc_id) = d.doc_id
       |      AND c.c_id IS NULL AS k3,
       |    coalesce(tl.lbl, d.doc_id) = d.doc_id
       |      AND coalesce(sl.lbl, d.doc_id) = d.doc_id
       |      AND c.c_id IS NULL
       |      AND ${TextAnalysis.mixAdmitSql("d.doc_id", "d.source")} AS k4
       |  FROM documents d
       |  LEFT JOIN t_labels tl ON tl.id = d.doc_id
       |  LEFT JOIN s_labels sl ON sl.id = d.doc_id
       |  LEFT JOIN contaminated c ON c.c_id = d.doc_id)""".stripMargin
  }

  private val q78Sql = {
    s"""WITH RECURSIVE
       |$funnelFlagsCtes,
       |agg AS (
       |  SELECT count(*) AS n0,
       |    CAST(sum(CASE WHEN k1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN k2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |    CAST(sum(CASE WHEN k3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
       |    CAST(sum(CASE WHEN k4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
       |  FROM flags)
       |SELECT stage, n_docs, n_dropped FROM (
       |  SELECT '0_corpus' AS stage, n0 AS n_docs, 0 AS n_dropped FROM agg
       |  UNION ALL
       |  SELECT '1_text_dedup', n1, n0 - n1 FROM agg
       |  UNION ALL
       |  SELECT '2_semantic_dedup', n2, n1 - n2 FROM agg
       |  UNION ALL
       |  SELECT '3_decontaminated', n3, n2 - n3 FROM agg
       |  UNION ALL
       |  SELECT '4_mixed', n4, n3 - n4 FROM agg)
       |ORDER BY stage""".stripMargin
  }

  private val q69Sql = {
    val mins = (0 until MinHashK)
      .map(i => s"min(${permSql(i, "h")}) AS m$i").mkString(",\n    ")
    val bandSelects = (0 until LshBands).map { b =>
      val ms = (0 until LshRows).map(r => s"m${b * LshRows + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws(',', $ms)) AS bh FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    val matches = (0 until MinHashK)
      .map(i => s"CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH fp AS (SELECT doc_id, ${contentFpSql("text")} AS fp FROM documents),
       |exact AS (
       |  SELECT n.doc_id, min(o.doc_id) AS exact_match
       |  FROM fp n JOIN fp o ON n.fp = o.fp
       |  WHERE n.doc_id % 2 = 1 AND o.doc_id % 2 = 0
       |  GROUP BY 1),
       |words AS ($docShinglesSql),
       |hashed AS (SELECT doc_id, ${md5u32Sql("w")} AS h FROM words),
       |sig AS (SELECT doc_id, $mins FROM hashed GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS o_id
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
       |  WHERE x.doc_id % 2 = 1 AND y.doc_id % 2 = 0),
       |near AS (
       |  SELECT cand.doc_id AS doc_id, min(o_id) AS near_match FROM cand
       |  JOIN sig sa ON sa.doc_id = cand.doc_id
       |  JOIN sig sb ON sb.doc_id = cand.o_id
       |  WHERE ($matches) >= $MinHashMatchMin
       |  GROUP BY 1)
       |SELECT n.doc_id,
       |  CASE WHEN e.exact_match IS NOT NULL THEN 'dup_exact'
       |       WHEN nr.near_match IS NOT NULL THEN 'dup_near'
       |       ELSE 'unique' END AS status,
       |  coalesce(e.exact_match, nr.near_match, -1) AS match_doc
       |FROM (SELECT doc_id FROM fp WHERE doc_id % 2 = 1) n
       |LEFT JOIN exact e ON e.doc_id = n.doc_id
       |LEFT JOIN near nr ON nr.doc_id = n.doc_id
       |ORDER BY n.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q82
  /** CROSS-SOURCE OVERLAP MATRIX — for every source pair, how many
    * content fingerprints appear in BOTH: the "which crawls/dumps are
    * re-serving each other's pages" diagnostic that decides source
    * dedup ORDER (dedup the pair with 40% overlap before mixing; leave
    * the disjoint pairs parallel) and catches a vendor reselling an
    * existing dump as new data. Jaccard is floored to micro-units for
    * engine parity.
    *
    * Scale posture: one distinct over (source, fp) — partial-aggregable
    * — then a self-join on fp whose per-key fan-out is bounded by the
    * number of SOURCES carrying that fp (≤ n_sources, a constant ~10²),
    * never by the fp's document count: a viral page duplicated 10⁶×
    * inside one crawl is still ONE (source, fp) row, so the planted-
    * viral-dup skew that forces q35's salting cannot arise here. Output
    * is ≤ n_sources² rows. */
  private def q82(spark: SparkSession, dir: String): DataFrame = {
    // Memoized: the frame is read from FOUR subplans below (two join
    // sides + two size lookups), and Catalyst does not dedupe common
    // subplans — uncached, each side would rescan + re-distinct the
    // full corpus.
    val fps = Features.cachedFrame(spark, s"$dir#sourceFps") {
      Tables.documents(spark, dir)
        .select(col("source"), contentFp(col("text")).as("fp"))
        .distinct()
    }
    val sizes = fps.groupBy(col("source")).agg(count(lit(1)).as("n"))
    // Probed r18 (the round-17 verdict's "never audited" item): every
    // downstream node is ≤ n_sources²-bounded (join out 2605 rows at
    // sf0.1) — the wall cost is the cached fps build (0.29 s intrinsic
    // corpus fp + distinct) plus ~5 stage barriers on tiny frames. A
    // collect_set + ordered-2-combination explode rewrite (kills the
    // self-join and the doubled sizes subtree) measured SLOWER:
    // 0.77 → 0.95 s, ObjectHashAggregate set-building beats the
    // tiny-broadcast join it replaced. Kept as-is; do not re-try.
    val pairs = fps.toDF("src_a", "fp")
      .join(fps.toDF("src_b", "fp"), "fp")
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("shared_fps"))
    pairs
      .join(broadcast(sizes.toDF("src_a", "n_a")), "src_a")
      .join(broadcast(sizes.toDF("src_b", "n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("shared_fps"),
        col("n_a"), col("n_b"),
        floor(lit(1000000.0) * col("shared_fps").cast("double") /
          (col("n_a") + col("n_b") - col("shared_fps")).cast("double"))
          .cast("long").as("jaccard_u"))
      .orderBy(col("src_a"), col("src_b"))
  }

  private val q82Sql =
    s"""WITH fps AS (
       |  SELECT DISTINCT source, ${contentFpSql("text")} AS fp
       |  FROM documents),
       |sizes AS (SELECT source, count(*) AS n FROM fps GROUP BY 1),
       |pairs AS (
       |  SELECT a.source AS src_a, b.source AS src_b,
       |    count(*) AS shared_fps
       |  FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT src_a, src_b, CAST(shared_fps AS BIGINT) AS shared_fps,
       |  CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
       |  CAST(floor(1000000.0 * CAST(shared_fps AS DOUBLE) /
       |    CAST(sa.n + sb.n - shared_fps AS DOUBLE)) AS BIGINT) AS jaccard_u
       |FROM pairs
       |JOIN sizes sa ON sa.source = src_a
       |JOIN sizes sb ON sb.source = src_b
       |ORDER BY src_a, src_b""".stripMargin

  // ---------------------------------------------------------------- q85
  /** EXACT-SUBSTRING SPAN DEDUP — the window pass of Lee et al. 2022
    * ("Deduplicating Training Data Makes Language Models Better"): slide
    * an 8-word window over every document, hash each window, and call a
    * window occurrence DUPLICATED when the same window text appears in
    * ≥ 2 distinct documents. Catches verbatim-shared passages inside
    * otherwise-distinct documents — the case document-level dedup
    * (q34/q35, whole-content keys) and intra-doc repetition (q80,
    * same-doc repeats) both miss by construction. Reported per source:
    * corpus-wide duplicated-span mass and how many documents exceed the
    * removal threshold (≥ 20% of their windows duplicated).
    *
    * Scale posture: windows explode ~len× rows but carry only an 8-byte
    * hash; the (h, doc) groupBy key is uniform md5 — balanced at any
    * scale. The cross-doc df groupBy is partial-aggregable counts, and
    * the dup-window filter is a semi join on the same uniform hash. A
    * boilerplate window shared by millions of docs produces a large but
    * count-only postings list — no row explosion, unlike a pair join.
    * (At 100 TB the true Lee et al. suffix-array pass is a different
    * machine; this window-hash formulation is its shuffle-native
    * approximation with one-word granularity loss at span edges.) */
  val SpanK = 8
  val SpanDocFracFlag = 0.20

  private def q85(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val perDocWin = docs
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), col("source"),
        explode(ngramOccurrences(col("text"), SpanK)).as("w"))
      .select(col("doc_id"), col("source"), md5u32(col("w")).as("h"))
      .groupBy(col("h"), col("doc_id"))
      .agg(count(lit(1)).as("n_occ"))
    // windows living in ≥ 2 distinct documents (cross-doc duplication).
    // One consumption of perDocWin (r17): the groupBy(h)+semi-join form
    // planned TWO copies of the ngram-explode subtree (column pruning
    // gives each consumer a different exchange, so ReuseExchange never
    // fires); a count over the h-partition is the same per-(h,doc_id)
    // n_docs_with — perDocWin has exactly one row per (h, doc_id) — and
    // the filter keeps exactly the semi-join's rows.
    val wH = Window.partitionBy(col("h"))
    val dupPerDoc = perDocWin
      .withColumn("n_docs_with", count(lit(1)).over(wH))
      .filter(col("n_docs_with") >= 2L)
      .groupBy(col("doc_id"))
      .agg(sum(col("n_occ")).as("n_dup"))
    // totals straight from the scan so zero-window (short) docs count
    val totals = docs.select(col("doc_id"), col("source"),
      greatest(size(tokens(col("text"))) - (SpanK - 1), lit(0))
        .cast("long").as("n_windows"))
    totals.join(dupPerDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_dup"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_windows")).as("n_windows"),
        sum(col("n_dup")).as("n_dup_windows"),
        sum(when(col("n_windows") > 0L &&
            col("n_dup").cast(DoubleType) / col("n_windows").cast(DoubleType)
              >= SpanDocFracFlag, 1L).otherwise(0L)).as("n_flagged"))
      .withColumn("dup_frac_u",
        floor(lit(1000000.0) * col("n_dup_windows").cast(DoubleType) /
          col("n_windows").cast(DoubleType)).cast("long"))
      .orderBy(col("source"))
  }

  private val q85Sql =
    s"""WITH wins AS (
       |  SELECT doc_id, ${md5u32Sql("w")} AS h FROM (
       |    SELECT doc_id, unnest(ws) AS w FROM (
       |      SELECT doc_id, ${ngramOccurrencesSql("text", SpanK)} AS ws
       |      FROM documents))),
       |per_doc_win AS (
       |  SELECT h, doc_id, count(*) AS n_occ FROM wins GROUP BY 1, 2),
       |dup_win AS (SELECT h FROM per_doc_win GROUP BY h HAVING count(*) >= 2),
       |dup_per_doc AS (
       |  SELECT doc_id, sum(n_occ) AS n_dup FROM per_doc_win
       |  WHERE h IN (SELECT h FROM dup_win) GROUP BY 1),
       |totals AS (
       |  SELECT doc_id, source,
       |    CAST(greatest(len(${tokensSql("text")}) - ${SpanK - 1}, 0) AS BIGINT)
       |      AS n_windows
       |  FROM documents),
       |j AS (
       |  SELECT t.source, t.n_windows, coalesce(d.n_dup, 0) AS n_dup
       |  FROM totals t LEFT JOIN dup_per_doc d USING (doc_id))
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(n_windows) AS BIGINT) AS n_windows,
       |  CAST(sum(n_dup) AS BIGINT) AS n_dup_windows,
       |  CAST(sum(CASE WHEN n_windows > 0 AND
       |      CAST(n_dup AS DOUBLE) / CAST(n_windows AS DOUBLE)
       |        >= $SpanDocFracFlag THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       |  CAST(floor(1000000.0 * CAST(sum(n_dup) AS DOUBLE) /
       |    CAST(sum(n_windows) AS DOUBLE)) AS BIGINT) AS dup_frac_u
       |FROM j GROUP BY 1 ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q88
  /** ASYMMETRIC CONTAINMENT top-20 — containment(A,B) = |A∩B| / min(|A|,
    * |B|) over the shared rare-shingle candidates. Jaccard punishes size
    * mismatch (a short doc quoted whole inside a long one has Jaccard ≈
    * |small|/|big| → 0) so the quote/excerpt/wrapper family of
    * duplication is invisible to q37; containment is the standard
    * asymmetric fix (the set-similarity literature's containment join).
    * Reports both metrics so the divergence is visible per pair.
    *
    * Scale posture: identical to q37 — candidates from the df-capped
    * inverted index (never all-pairs), exact verify only on candidates;
    * the metric swap costs nothing extra. */
  private def q88(spark: SparkSession, dir: String): DataFrame = {
    val sh = Features.shingleSets(spark, dir)
    val sa = sh.toDF("a_doc", "a_ss")
    val sb = sh.toDF("b_doc", "b_ss")
    rareShingleCandidates(spark, dir)
      .join(sa, col("doc_a") === col("a_doc"))
      .join(sb, col("doc_b") === col("b_doc"))
      .withColumn("n_common",
        size(array_intersect(col("a_ss"), col("b_ss"))).cast("long"))
      .filter(col("n_common") >= 2L)
      .withColumn("n_small",
        least(size(col("a_ss")), size(col("b_ss"))).cast("long"))
      .withColumn("containment_u",
        floor(lit(1000000.0) * col("n_common").cast(DoubleType) /
          col("n_small").cast(DoubleType)).cast("long"))
      .withColumn("jaccard_u",
        floor(lit(1000000.0) * col("n_common").cast(DoubleType) /
          (size(col("a_ss")).cast(DoubleType) +
            size(col("b_ss")).cast(DoubleType) -
            col("n_common").cast(DoubleType))).cast("long"))
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("n_small"),
        col("containment_u"), col("jaccard_u"))
      .orderBy(col("containment_u").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  private val q88Sql =
    s"""WITH sh AS (
       |  SELECT doc_id, ${shinglesSql("text")} AS ss
       |  FROM documents),
       |post AS (SELECT doc_id, ${md5u32Sql("w")} AS s
       |         FROM (SELECT doc_id, unnest(ss) AS w FROM sh)),
       |rare_s AS (SELECT s FROM post GROUP BY s HAVING count(*) <= $ShingleDfCap),
       |rare AS (SELECT doc_id, p.s FROM post p JOIN rare_s USING (s)),
       |cand AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM rare x JOIN rare y ON x.s = y.s AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2
       |  HAVING count(*) >= 2),
       |scored AS (
       |  SELECT doc_a, doc_b,
       |    CAST(len(list_intersect(sa.ss, sb.ss)) AS BIGINT) AS n_common,
       |    CAST(least(len(sa.ss), len(sb.ss)) AS BIGINT) AS n_small,
       |    CAST(len(sa.ss) AS BIGINT) + CAST(len(sb.ss) AS BIGINT) AS n_total
       |  FROM cand
       |  JOIN sh sa ON sa.doc_id = doc_a
       |  JOIN sh sb ON sb.doc_id = doc_b)
       |SELECT doc_a, doc_b, n_common, n_small,
       |  CAST(floor(1000000.0 * CAST(n_common AS DOUBLE) /
       |    CAST(n_small AS DOUBLE)) AS BIGINT) AS containment_u,
       |  CAST(floor(1000000.0 * CAST(n_common AS DOUBLE) /
       |    CAST(n_total - n_common AS DOUBLE)) AS BIGINT) AS jaccard_u
       |FROM scored
       |WHERE n_common >= 2
       |ORDER BY containment_u DESC, doc_a, doc_b
       |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q108
  /** DEDUP METHOD-AGREEMENT AUDIT — the cross-method confusion table a
    * dedup-ops team reads before trusting any single sketch: take every
    * pair ANY method flagged (content-normalized exact equality = q34's
    * fingerprint, MinHash/LSH = q35's verified pairs, SimHash = q36's
    * hamming ≤ 3 pairs, exact shingle-Jaccard ≥ [[JaccardAuditMin]]
    * over q37's rare-shingle candidates) and count pairs per
    * method-combination. Disagreement rows are diagnoses, not noise:
    * content=1/simhash=0 pairs are the word-shuffled duplicates
    * order-sensitive sketches structurally miss; jaccard=1/minhash=0
    * pairs sit in the banding false-negative tail q96 quantifies;
    * minhash=1/jaccard=0 pairs are banding accidents on short docs.
    * Complements q96/q98 (which audit each sketch's ESTIMATE against
    * exact metric) by auditing the DECISION sets against each other.
    *
    * Every leg is the production pair generator, not a re-derivation:
    * q35's [[minhashVerifiedPairs]], q36's [[simhashVerifiedPairs]],
    * q37's [[jaccardScoredPairs]] — so the audit measures the pipeline
    * that actually ships decisions.
    *
    * Scale posture: every pair set is banding-/df-cap-bounded (never
    * all-pairs); the content-equality leg self-joins fingerprint
    * GROUPS, so viral-dup groups (empty docs, error pages — routinely
    * million-copy at crawl scale, the same hazard [[saltedSelfPairs]]
    * defends) are the quadratic risk. The audit therefore caps that
    * leg at [[ContentEqGroupCap]] members per fingerprint group
    * (conf `spark.graft.audit.contentGroupCap`): group sizes come
    * from q34's grouped form via one partial-aggregable groupBy, and
    * pairs are emitted only for groups at or under the cap — the
    * leg's output is ≤ cap²/2 rows per group instead of m²/2. The
    * identical HAVING bound lives in the oracle CTE, so parity is
    * structural at every SF, not an accident of fixture group sizes
    * (sf0.1's largest group is 248, just under the default 256).
    * Capped groups are a count a spec pins, not lost silently; q60's
    * decision table remains what ships. The union and flag joins are
    * pair-keyed over those bounded sets, and the output is ≤ 2⁴ rows
    * via one partial-aggregable groupBy. */
  val JaccardAuditMin = 0.5
  val ContentEqGroupCap = 256

  /** Content-equality pairs for q108's exact leg, bounded by the
    * group-size cap: fingerprint groups larger than `cap` emit NO
    * pairs (they are sketch-trivial anyway — every member is an exact
    * dup — while m²/2 pair emission would dominate the whole audit).
    * Group sizes are a map-side-combinable groupBy, and the survivor
    * self-join is bounded at cap²/2 pairs per group by construction. */
  private[graft] def contentEqPairs(fp: DataFrame, cap: Int): DataFrame = {
    val small = fp.join(
      fp.groupBy(col("fp")).agg(count(lit(1)).as("grp_n"))
        .filter(col("grp_n") <= cap).select(col("fp")),
      Seq("fp"))
    small.select(col("doc_id").as("a_id"), col("fp").as("a_fp"))
      .join(small.select(col("doc_id").as("b_id"), col("fp").as("b_fp")),
        col("a_fp") === col("b_fp") && col("a_id") < col("b_id"))
      .select(col("a_id").as("doc_a"), col("b_id").as("doc_b"))
  }

  /** Fingerprint groups the cap excluded — the audit's honesty
    * counter (a planted-viral-group spec pins both this and the
    * pair-count bound). */
  private[graft] def cappedGroups(fp: DataFrame, cap: Int): DataFrame =
    fp.groupBy(col("fp")).agg(count(lit(1)).as("grp_n"))
      .filter(col("grp_n") > cap)

  private def q108(spark: SparkSession, dir: String): DataFrame = {
    val fp = Tables.documents(spark, dir)
      .select(col("doc_id"), contentFp(col("text")).as("fp"))
    val cap = spark.conf.getOption("spark.graft.audit.contentGroupCap")
      .map(_.toInt).getOrElse(ContentEqGroupCap)
    // Each leg is referenced TWICE (universe union + its flag join);
    // without materialization Spark re-runs every generator's full
    // candidate pipeline per reference — measured 4.0 s → ~half at
    // sf0.1. The pair sets are banding-bounded (dozens of rows), so an
    // eager localCheckpoint pins each leg's result for pennies.
    def pin(pairs: DataFrame): DataFrame =
      pairs.distinct().localCheckpoint(true)
    val ex = pin(contentEqPairs(fp, cap))
    val mh = pin(minhashVerifiedPairs(minhashSig(spark, dir))
      .select(col("doc_a"), col("doc_b")))
    val sh = pin(simhashVerifiedPairs(spark, dir)
      .select(col("doc_a"), col("doc_b")))
    val jc = pin(jaccardScoredPairs(spark, dir)
      .filter(col("jaccard") >= JaccardAuditMin)
      .select(col("doc_a"), col("doc_b")))
    val universe = ex.union(mh).union(sh).union(jc).distinct()
    def flag(pairs: DataFrame, name: String) =
      pairs.withColumn(name, lit(1L))
    universe
      .join(flag(ex, "content_eq"), Seq("doc_a", "doc_b"), "left")
      .join(flag(mh, "minhash_hit"), Seq("doc_a", "doc_b"), "left")
      .join(flag(sh, "simhash_hit"), Seq("doc_a", "doc_b"), "left")
      .join(flag(jc, "jaccard_hit"), Seq("doc_a", "doc_b"), "left")
      .select(
        coalesce(col("content_eq"), lit(0L)).as("content_eq"),
        coalesce(col("minhash_hit"), lit(0L)).as("minhash_hit"),
        coalesce(col("simhash_hit"), lit(0L)).as("simhash_hit"),
        coalesce(col("jaccard_hit"), lit(0L)).as("jaccard_hit"))
      .groupBy(col("content_eq"), col("minhash_hit"), col("simhash_hit"),
        col("jaccard_hit"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("content_eq").desc, col("minhash_hit").desc,
        col("simhash_hit").desc, col("jaccard_hit").desc)
  }

  private lazy val q108Sql =
    s"""WITH fps AS (
       |  SELECT doc_id, ${contentFpSql("text")} AS fp FROM documents),
       |small_fp AS (
       |  SELECT fp FROM fps GROUP BY fp
       |  HAVING count(*) <= $ContentEqGroupCap),
       |ex AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM (SELECT doc_id, fp FROM fps JOIN small_fp USING (fp)) a
       |  JOIN (SELECT doc_id, fp FROM fps JOIN small_fp USING (fp)) b
       |    ON a.fp = b.fp AND a.doc_id < b.doc_id),
       |mh AS (SELECT doc_a, doc_b FROM ($q35Sql)),
       |sh AS (SELECT doc_a, doc_b FROM ($q36Sql)),
       |jcs AS (
       |  SELECT doc_a, doc_b,
       |    CAST(len(list_intersect(sa.ss, sb.ss)) AS BIGINT) AS n_common,
       |    CAST(len(sa.ss) AS BIGINT) + CAST(len(sb.ss) AS BIGINT) AS n_total
       |  FROM (
       |    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
       |    FROM (SELECT doc_id, p.s FROM
       |            (SELECT doc_id, ${md5u32Sql("w")} AS s
       |             FROM (SELECT doc_id, unnest(${shinglesSql("text")}) AS w
       |                   FROM documents)) p
       |          JOIN (SELECT s FROM
       |                  (SELECT doc_id, ${md5u32Sql("w")} AS s
       |                   FROM (SELECT doc_id, unnest(${shinglesSql("text")}) AS w
       |                         FROM documents))
       |                GROUP BY s HAVING count(*) <= $ShingleDfCap)
       |            USING (s)) x
       |    JOIN (SELECT doc_id, p.s FROM
       |            (SELECT doc_id, ${md5u32Sql("w")} AS s
       |             FROM (SELECT doc_id, unnest(${shinglesSql("text")}) AS w
       |                   FROM documents)) p
       |          JOIN (SELECT s FROM
       |                  (SELECT doc_id, ${md5u32Sql("w")} AS s
       |                   FROM (SELECT doc_id, unnest(${shinglesSql("text")}) AS w
       |                         FROM documents))
       |                GROUP BY s HAVING count(*) <= $ShingleDfCap)
       |            USING (s)) y
       |      ON x.s = y.s AND x.doc_id < y.doc_id
       |    GROUP BY 1, 2 HAVING count(*) >= 2) cand
       |  JOIN (SELECT doc_id, ${shinglesSql("text")} AS ss FROM documents) sa
       |    ON sa.doc_id = doc_a
       |  JOIN (SELECT doc_id, ${shinglesSql("text")} AS ss FROM documents) sb
       |    ON sb.doc_id = doc_b),
       |jc AS (
       |  SELECT doc_a, doc_b FROM jcs
       |  WHERE n_common >= 2
       |    AND CAST(n_common AS DOUBLE) / CAST(n_total - n_common AS DOUBLE)
       |        >= $JaccardAuditMin),
       |u AS (
       |  SELECT doc_a, doc_b FROM ex UNION
       |  SELECT doc_a, doc_b FROM mh UNION
       |  SELECT doc_a, doc_b FROM sh UNION
       |  SELECT doc_a, doc_b FROM jc),
       |flags AS (
       |  SELECT u.doc_a, u.doc_b,
       |    CASE WHEN e.doc_a IS NOT NULL THEN 1 ELSE 0 END AS content_eq,
       |    CASE WHEN m.doc_a IS NOT NULL THEN 1 ELSE 0 END AS minhash_hit,
       |    CASE WHEN s.doc_a IS NOT NULL THEN 1 ELSE 0 END AS simhash_hit,
       |    CASE WHEN j.doc_a IS NOT NULL THEN 1 ELSE 0 END AS jaccard_hit
       |  FROM u
       |  LEFT JOIN (SELECT DISTINCT doc_a, doc_b FROM ex) e
       |    ON u.doc_a = e.doc_a AND u.doc_b = e.doc_b
       |  LEFT JOIN (SELECT DISTINCT doc_a, doc_b FROM mh) m
       |    ON u.doc_a = m.doc_a AND u.doc_b = m.doc_b
       |  LEFT JOIN (SELECT DISTINCT doc_a, doc_b FROM sh) s
       |    ON u.doc_a = s.doc_a AND u.doc_b = s.doc_b
       |  LEFT JOIN (SELECT DISTINCT doc_a, doc_b FROM jc) j
       |    ON u.doc_a = j.doc_a AND u.doc_b = j.doc_b)
       |SELECT CAST(content_eq AS BIGINT) AS content_eq,
       |  CAST(minhash_hit AS BIGINT) AS minhash_hit,
       |  CAST(simhash_hit AS BIGINT) AS simhash_hit,
       |  CAST(jaccard_hit AS BIGINT) AS jaccard_hit,
       |  count(*) AS n_pairs
       |FROM flags GROUP BY 1, 2, 3, 4
       |ORDER BY content_eq DESC, minhash_hit DESC, simhash_hit DESC,
       |  jaccard_hit DESC""".stripMargin

  // ---------------------------------------------------------------- q116
  /** CROSS-SPLIT LEAKAGE AUDIT — the check a content-stable split
    * (q83) cannot make by construction: EXACT duplicates land in the
    * same split (same content fingerprint ⇒ same bucket), but
    * NEAR-duplicates carry different fingerprints and hash
    * independently, so a train/test boundary can separate two
    * documents that are 95% the same text — the classic eval leak a
    * held-out split is supposed to prevent. This audit stamps q83's
    * split assignment onto q35's verified MinHash near-dup pairs and
    * cross-tabulates: any row with `cross_split = true` is leakage a
    * training team must resolve (move one member, or drop it from
    * eval) BEFORE the split ships. The same-split rows are the benign
    * baseline mass for scale.
    *
    * Everything is the production machinery by reference — q35's
    * banded pair generator (never all-pairs) and q83's `splitAssign`
    * (ONE definition with the write path) — so the audit measures
    * exactly the split and the near-dup graph that ship.
    *
    * Scale posture: pairs are sketch-bounded (banding + ≥13/16
    * verify); the split stamp is two id-keyed joins of the pair table
    * against the narrow (doc_id, split) projection — uniform keys, and
    * the pair side is report-shaped at any corpus size; the cross-tab
    * is one partial-aggregable groupBy over ≤ 6 cells. */
  private def q116(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minhashVerifiedPairs(minhashSig(spark, dir))
      .select(col("doc_a"), col("doc_b"), col("n_matches"))
    val splits = Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.splitAssign.as("split"))
    pairs
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("sa")),
        "doc_a")
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("sb")),
        "doc_b")
      .select(least(col("sa"), col("sb")).as("split_lo"),
        greatest(col("sa"), col("sb")).as("split_hi"), col("n_matches"))
      .groupBy(col("split_lo"), col("split_hi"))
      .agg(count(lit(1)).as("n_pairs"),
        max(col("n_matches")).as("max_matches"))
      .withColumn("cross_split", col("split_lo") =!= col("split_hi"))
      .select(col("split_lo"), col("split_hi"), col("n_pairs"),
        col("max_matches"), col("cross_split"))
      .orderBy(col("split_lo"), col("split_hi"))
  }

  private lazy val q116Sql =
    s"""WITH pairs AS (SELECT doc_a, doc_b, n_matches FROM ($q35Sql)),
       |sp AS (
       |  SELECT doc_id,
       |    CASE WHEN bucket <= 7 THEN 'train'
       |         WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split
       |  FROM (SELECT doc_id,
       |          ${md5u32Sql(contentFpSql("text"))} % 10 AS bucket
       |        FROM documents)),
       |j AS (
       |  SELECT least(a.split, b.split) AS split_lo,
       |    greatest(a.split, b.split) AS split_hi, n_matches
       |  FROM pairs
       |  JOIN sp a ON pairs.doc_a = a.doc_id
       |  JOIN sp b ON pairs.doc_b = b.doc_id)
       |SELECT split_lo, split_hi, count(*) AS n_pairs,
       |  CAST(max(n_matches) AS BIGINT) AS max_matches,
       |  (split_lo <> split_hi) AS cross_split
       |FROM j GROUP BY 1, 2
       |ORDER BY split_lo, split_hi""".stripMargin

  // ---------------------------------------------------------------- q133
  /** LEAKAGE-CLOSING SPLIT REPAIR — the action q116's audit demands:
    * reassign every member of a near-dup cluster to the split of the
    * cluster's CANONICAL document (the CC label — the component's
    * minimum doc_id), so near-duplicates can no longer straddle the
    * train/test boundary. After repair, cross-split leakage is zero BY
    * CONSTRUCTION: both members of every verified pair carry the same
    * cluster label, hence the same repaired split (spec-pinned by
    * re-running the q116 cross-tab on the repaired assignment).
    * Unclustered documents keep their content-stable q83 split
    * untouched, so the repair perturbs the 80/10/10 strata only by the
    * (small) clustered mass — exactly the minimal move-set a training
    * team wants, and the report quantifies the perturbation: the
    * (orig_split, new_split) cross-tab with per-cell doc counts, the
    * off-diagonal rows being the documents that moved.
    *
    * Deterministic: the canonical member is the component minimum (the
    * label the CC fixpoint already computes), not a quality score or
    * arbitrary representative — reproducible across engines and runs.
    *
    * Scale posture: rides the MEMOIZED CC labels (the fixpoint runs
    * once per corpus, shared with q56/q60/q70/q77/q110); the repair is
    * two id-keyed joins of the label table (cluster-mass-sized, tiny
    * vs corpus) against the narrow (doc_id, split) projection, plus
    * one broadcast-able canonical lookup; the cross-tab is one
    * partial-aggregable groupBy over ≤ 9 cells. The repaired
    * assignment column is write-path-stampable exactly like q83's
    * (same `splitAssign` + label override recipe). */
  private def q133(spark: SparkSession, dir: String): DataFrame = {
    val splits = Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.splitAssign.as("split"))
    val labels = ccLabels(spark, dir) // (id, lbl); lbl = component min id
    // Canonical split per cluster: the label doc's own q83 assignment.
    // The label table is cluster-mass-sized — broadcast-able at report
    // scale; the doc_id-keyed joins stay uniform-key shuffles at 100 TB.
    val canon = labels.select(col("lbl")).distinct()
      .join(splits.select(col("doc_id").as("lbl"), col("split").as("canon_split")),
        "lbl")
    val repaired = labels.join(canon, "lbl")
      .select(col("id").as("doc_id"), col("canon_split"))
    splits.join(repaired, Seq("doc_id"), "left")
      .select(col("split").as("orig_split"),
        coalesce(col("canon_split"), col("split")).as("new_split"))
      .groupBy(col("orig_split"), col("new_split"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("moved", col("orig_split") =!= col("new_split"))
      .select(col("orig_split"), col("new_split"), col("n_docs"), col("moved"))
      .orderBy(col("orig_split"), col("new_split"))
  }

  private lazy val q133Sql =
    s"""WITH RECURSIVE
       |$ccLabelsSqlCtes,
       |sp AS (
       |  SELECT doc_id,
       |    CASE WHEN bucket <= 7 THEN 'train'
       |         WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split
       |  FROM (SELECT doc_id,
       |          ${md5u32Sql(contentFpSql("text"))} % 10 AS bucket
       |        FROM documents)),
       |canon AS (
       |  SELECT DISTINCT l.lbl, c.split AS canon_split
       |  FROM labels l JOIN sp c ON l.lbl = c.doc_id),
       |rep AS (
       |  SELECT l.id AS doc_id, canon.canon_split
       |  FROM labels l JOIN canon ON l.lbl = canon.lbl),
       |fix AS (
       |  SELECT sp.split AS orig_split,
       |    coalesce(rep.canon_split, sp.split) AS new_split
       |  FROM sp LEFT JOIN rep ON sp.doc_id = rep.doc_id)
       |SELECT orig_split, new_split, count(*) AS n_docs,
       |  (orig_split <> new_split) AS moved
       |FROM fix GROUP BY 1, 2
       |ORDER BY orig_split, new_split""".stripMargin

  // ---------------------------------------------------------------- q138
  /** REPETITION-EXPOSURE AUDIT — the memorization-risk number the
    * epoch plan and the dedup report each miss on their own: a
    * document's EFFECTIVE training appearances are
    * `epochs(source) × copies(content)` — q103's allocator can repeat
    * a source 3× and the corpus can carry 5 near-copies of the same
    * document, and training then sees that content ~15 times. The
    * published memorization results (Lee et al. 2022; Carlini et al.
    * 2023) are monotone in exactly this product, not in either factor
    * alone — a feed can look safe in q103 (epochs ≤ 4) AND in q110
    * (clusters small) while specific documents cross the risk line.
    *
    * Per source: doc count, docs whose exposure crosses the 4-epoch
    * cliff q103 already uses (micro-scale: exposure_u > 4·10⁶), the
    * worst exposure, and total micro-appearances (the Σ that divided
    * by 10⁶·n_docs is the feed's mean effective repeat).
    *
    * Cluster size here is the CC component size over verified near-dup
    * pairs (q110's bands), singletons = 1 via the same anti-join-free
    * left join + coalesce; epochs are q103's exact allocator read from
    * the factored [[TextAnalysis.epochAlloc]], so plan and audit
    * cannot disagree.
    *
    * Scale posture: rides the MEMOIZED CC labels (fixpoint runs once,
    * shared with q56/q60/q110/q133); cluster sizes are one
    * partial-aggregable groupBy of the cluster-mass-sized label table;
    * the allocator is a source-count-row broadcast; the only
    * corpus-sized work is one doc_id-keyed left join + one per-source
    * groupBy — both uniform-key. exposure_u ≤ epochs_u·m ≲ 10¹¹ and
    * the per-source Σ stays far under int64. */
  private def q138(spark: SparkSession, dir: String): DataFrame = {
    val labels = ccLabels(spark, dir)
    val copies = labels
      .join(labels.groupBy(col("lbl")).agg(count(lit(1)).as("m")), "lbl")
      .select(col("id"), col("m"))
    val ep = broadcast(TextAnalysis.epochAlloc(spark, dir)
      .select(col("source").as("esrc"), col("epochs_u")))
    Tables.documents(spark, dir).select(col("doc_id"), col("source"))
      .join(copies, col("doc_id") === col("id"), "left")
      .join(ep, col("source") === col("esrc"))
      .withColumn("exposure_u", col("epochs_u") * coalesce(col("m"), lit(1L)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("exposure_u") > 4000000L, 1L).otherwise(0L))
          .as("n_at_risk"),
        max(col("exposure_u")).as("max_exposure_u"),
        sum(col("exposure_u")).as("total_exposure_u"))
      .orderBy(col("source"))
  }

  private lazy val q138Sql =
    s"""WITH RECURSIVE
       |$ccLabelsSqlCtes,
       |sizes AS (SELECT lbl, count(*) AS m FROM labels GROUP BY lbl),
       |copies AS (SELECT id, m FROM labels JOIN sizes USING (lbl)),
       |${TextAnalysis.epochAllocSqlCtes},
       |expo AS (
       |  SELECT d.source,
       |    CAST(e.epochs_u * COALESCE(c.m, 1) AS BIGINT) AS exposure_u
       |  FROM documents d
       |  LEFT JOIN copies c ON d.doc_id = c.id
       |  JOIN ealloc e ON d.source = e.source)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN exposure_u > 4000000 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_at_risk,
       |  CAST(max(exposure_u) AS BIGINT) AS max_exposure_u,
       |  CAST(sum(exposure_u) AS BIGINT) AS total_exposure_u
       |FROM expo GROUP BY source
       |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q139
  /** DELETION-PROPAGATION AUDIT — the right-to-be-forgotten cascade: a
    * takedown/opt-out list doesn't just delete rows, it invalidates
    * every DERIVED artifact that embeds those rows, and the compliance
    * question is always "what else must change?". For a deterministic
    * deletion set ([[DeleteMod]]: `doc_id % 23 == 0`, standing in for
    * the uploaded id list — a real run broadcasts the list, same
    * plan), one row quantifying the full blast radius:
    *
    *  - `n_deleted` — corpus rows to drop;
    *  - `n_clusters_touched` — dedup components losing ≥ 1 member
    *    (their size bands in q110, soft weights in q123 and exposure
    *    in q138 all shift);
    *  - `n_handoffs` — clusters whose CANONICAL doc (the CC label =
    *    component min, the keeper in q60's decision table) is deleted
    *    while members survive: the keep/canonical table must re-elect
    *    (deterministically: the next-smallest surviving id);
    *  - `n_dissolved` — clusters erased entirely;
    *  - `n_chunks_purged` — q104 chunk-table rows to delete from the
    *    RAG store (chunk_md5s may be shared with surviving docs — the
    *    md5-keyed store purges BY doc_id, exactly these rows);
    *  - `n_vectors_purged` — embedding rows on q97's audited
    *    vec_id↔doc_id relation;
    *  - `n_shard_cells_touched` — (epoch, shard) cells of q111's plan
    *    containing ≥ 1 deleted doc: the training shards to rewrite.
    *
    * Scale posture: the deletion flag is a per-row predicate (a real
    * list is a broadcast semi join); the cluster legs ride the
    * MEMOIZED CC labels and aggregate the cluster-mass-sized label
    * table; chunks are counted by q104's closed-form n_chunks (no
    * chunk-row explosion — count ≠ materialize); vectors are one
    * id-keyed join (co-located under id bucketing, `BucketingSpec`);
    * shard cells are a ≤ epochs·shards distinct over the deleted
    * slice only. Everything partial-aggregable into ONE output row. */
  val DeleteMod = 23

  /** q139's cascade for an ARBITRARY deletion-id frame — the streaming
    * tombstone monitor scores each accumulated takedown list through
    * exactly this code, so batch audit and ingest monitor cannot
    * diverge. `delIds` is a single-column (doc_id) frame, takedown-
    * list-sized — broadcast-able by nature. The canonical-deleted test
    * is the membership flag OF THE LABEL MEMBER (`id == lbl` row),
    * equivalent to testing the label id itself since the label is
    * always a member of its component. */
  private[graft] def deletionCascadeOver(spark: SparkSession, dir: String,
      delIds: DataFrame): DataFrame = {
    val C = 32L; val S = 24L
    val del = broadcast(delIds.select(col("doc_id").as("del_id")).distinct())
    val deleted = Tables.documents(spark, dir)
      .join(del, col("doc_id") === col("del_id"))
    val labels = ccLabels(spark, dir)
    val clusters = labels
      .join(del, col("id") === col("del_id"), "left")
      .withColumn("del", when(col("del_id").isNotNull, 1L).otherwise(0L))
      .groupBy(col("lbl"))
      .agg(count(lit(1)).as("sz"), sum(col("del")).as("n_del"),
        sum(when(col("id") === col("lbl"), col("del")).otherwise(0L))
          .as("lbl_del"))
      .filter(col("n_del") > 0L)
      .agg(count(lit(1)).as("n_clusters_touched"),
        sum(when(col("lbl_del") === 1L && col("n_del") < col("sz"),
          1L).otherwise(0L)).as("n_handoffs"),
        sum(when(col("n_del") === col("sz"), 1L).otherwise(0L))
          .as("n_dissolved"))
    val n = size(tokens(col("text"))).cast("long")
    val m = n + (S - 1 - C)
    val chunkCounts = deleted
      .select(when(n <= C, 1L)
        .otherwise(((m - m % S) / S).cast("long") + 1L).as("nc"))
      .agg(count(lit(1)).as("n_deleted"), sum(col("nc")).as("n_chunks_purged"))
    val vecs = Tables.embeddings(spark, dir).select(col("vec_id"))
      .join(deleted.select(col("doc_id")), col("vec_id") === col("doc_id"))
      .agg(count(lit(1)).as("n_vectors_purged"))
    val cells = deleted
      .select(col("doc_id"), TextAnalysis.epochFan().as("epoch"))
      .select(col("epoch"),
        TextAnalysis.shardAssign(col("doc_id"), col("epoch")).as("shard"))
      .distinct()
      .agg(count(lit(1)).as("n_shard_cells_touched"))
    // coalesce: every leg must report 0, not NULL, on an empty
    // deletion set (sum over zero rows is NULL in both engines).
    chunkCounts.crossJoin(broadcast(clusters))
      .crossJoin(broadcast(vecs))
      .crossJoin(broadcast(cells))
      .select(col("n_deleted"), col("n_clusters_touched"),
        coalesce(col("n_handoffs"), lit(0L)).as("n_handoffs"),
        coalesce(col("n_dissolved"), lit(0L)).as("n_dissolved"),
        coalesce(col("n_chunks_purged"), lit(0L)).as("n_chunks_purged"),
        col("n_vectors_purged"), col("n_shard_cells_touched"))
  }

  private def q139(spark: SparkSession, dir: String): DataFrame =
    deletionCascadeOver(spark, dir,
      Tables.documents(spark, dir).select(col("doc_id"))
        .filter(col("doc_id") % DeleteMod === 0))

  private lazy val q139Sql =
    s"""WITH RECURSIVE
       |$ccLabelsSqlCtes,
       |cl AS (
       |  SELECT lbl, count(*) AS sz,
       |    CAST(sum(CASE WHEN id % $DeleteMod = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_del
       |  FROM labels GROUP BY lbl),
       |clrep AS (
       |  SELECT count(*) AS n_clusters_touched,
       |    CAST(sum(CASE WHEN lbl % $DeleteMod = 0 AND n_del < sz
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_handoffs,
       |    CAST(sum(CASE WHEN n_del = sz THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_dissolved
       |  FROM cl WHERE n_del > 0),
       |dd AS (
       |  SELECT doc_id, CAST(len(${tokensSql("text")}) AS BIGINT) AS n
       |  FROM documents WHERE doc_id % $DeleteMod = 0),
       |ck AS (
       |  SELECT count(*) AS n_deleted,
       |    CAST(sum(CASE WHEN n <= 32 THEN 1
       |      ELSE CAST(((n - 9) - ((n - 9) % 24)) / 24 AS BIGINT) + 1 END)
       |      AS BIGINT) AS n_chunks_purged
       |  FROM dd),
       |vp AS (
       |  SELECT count(*) AS n_vectors_purged
       |  FROM embeddings e JOIN dd ON e.vec_id = dd.doc_id),
       |sc AS (
       |  SELECT count(*) AS n_shard_cells_touched FROM (
       |    SELECT DISTINCT epoch,
       |      ${md5u32Sql(
      "(CAST(doc_id AS VARCHAR) || '#ep' || CAST(epoch AS VARCHAR))")}
       |        % ${TextAnalysis.ShuffleShards} AS shard
       |    FROM (SELECT doc_id,
       |            unnest(range(0, ${TextAnalysis.ShuffleEpochs})) AS epoch
       |          FROM dd)))
       |SELECT ck.n_deleted, clrep.n_clusters_touched,
       |  COALESCE(clrep.n_handoffs, 0) AS n_handoffs,
       |  COALESCE(clrep.n_dissolved, 0) AS n_dissolved,
       |  COALESCE(ck.n_chunks_purged, 0) AS n_chunks_purged,
       |  vp.n_vectors_purged, sc.n_shard_cells_touched
       |FROM ck, clrep, vp, sc""".stripMargin

  // ---------------------------------------------------------------- q140
  /** CANONICAL RE-ELECTION TABLE — the actionable half of q139's
    * `n_handoffs` count: for every cluster whose canonical document is
    * in the deletion set while members survive, the row the
    * keep/canonical store (q60's decision table) must apply — old
    * canonical, new canonical, surviving membership. The new canonical
    * is the MINIMUM SURVIVING id: the same deterministic election rule
    * the CC fixpoint used in the first place (component min), so after
    * applying these rows the decision table looks exactly as if the
    * deleted docs had never existed — no quality-score tie-breaks, no
    * engine-varying choice. Row count == q139's `n_handoffs` by
    * construction (cross-checked in `DeletionCascadeSpec`).
    *
    * Scale posture: one partial-aggregable groupBy over the MEMOIZED
    * cluster-mass-sized CC label table (the conditional min/sum fold
    * into the same pass), then a filter — no corpus scan at all; the
    * output is handoff-sized (a tiny fraction of clusters). */
  private def q140(spark: SparkSession, dir: String): DataFrame = {
    val surv = col("id") % DeleteMod =!= 0
    ccLabels(spark, dir)
      .groupBy(col("lbl"))
      .agg(min(when(surv, col("id"))).as("new_canonical"),
        sum(when(surv, 1L).otherwise(0L)).as("n_survivors"),
        count(lit(1)).as("cluster_size"))
      .filter(col("lbl") % DeleteMod === 0 && col("n_survivors") > 0L)
      .select(col("lbl").as("old_canonical"), col("new_canonical"),
        col("n_survivors"), col("cluster_size"))
      .orderBy(col("old_canonical"))
  }

  private lazy val q140Sql =
    s"""WITH RECURSIVE
       |$ccLabelsSqlCtes,
       |re AS (
       |  SELECT lbl,
       |    min(CASE WHEN id % $DeleteMod <> 0 THEN id END) AS new_canonical,
       |    CAST(sum(CASE WHEN id % $DeleteMod <> 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_survivors,
       |    count(*) AS cluster_size
       |  FROM labels GROUP BY lbl)
       |SELECT lbl AS old_canonical, new_canonical, n_survivors, cluster_size
       |FROM re WHERE lbl % $DeleteMod = 0 AND n_survivors > 0
       |ORDER BY old_canonical""".stripMargin

  // ---------------------------------------------------------------- q118
  /** EXACT-SUBSTRING DECONTAMINATION — the long-window verbatim gate
    * run alongside q73's 3-gram overlap: flag every training document
    * sharing an [[SpanK]]-word (8-word) window with the eval slice.
    * The GPT-3/PaLM-era contamination reports use long n-gram exact
    * match (8–13 grams) precisely because 3-gram overlap over a
    * benchmark-sized eval set fires on common phrases; an 8-word
    * verbatim window is essentially never a coincidence, so this
    * gate's hits are the "the benchmark text is literally in the
    * training set" list, with far fewer false positives and
    * correspondingly higher per-hit severity. Reuses q85's window
    * machinery (same [[SpanK]], same occurrence hashes) against q73's
    * eval slice — the span-level member of the decontamination family
    * (q73 3-gram, q105 embedding, this verbatim).
    *
    * Scale posture: q73's exact shape one level up — the eval side's
    * window hashes are broadcast (benchmarks are small), the training
    * windows stream through the broadcast join with NO shuffle beyond
    * the per-doc aggregates; window explosion carries only 8-byte
    * hashes (q85's argument). */
  /** [[SpanK]]-word window-hash occurrences of an ARBITRARY docs frame
    * (any schema carrying doc_id + text): (doc_id, h). ONE definition —
    * batch q118 and the streaming span gate both read it, so a window
    * or hash change cannot silently diverge the stream from the batch
    * oracle (the [[hashedShinglesOver]] posture, one window size up). */
  private[graft] def spanWindowsOver(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(ngramOccurrences(col("text"), SpanK)).as("w"))
      .select(col("doc_id"), md5u32(col("w")).as("h"))

  /** FROZEN eval-side span artifact: each benchmark-slice window hash
    * with its smallest eval doc — built once per (session, dir), the
    * broadcast side of q118 and of the streaming span gate (benchmarks
    * are small and versioned, so the artifact ships like
    * [[evalPostings]]). */
  private[graft] def evalSpanWindows(spark: SparkSession, dir: String): DataFrame =
    Features.cachedFrame(spark, s"$dir#evalSpanWindows") {
      spanWindowsOver(Tables.documents(spark, dir)
        .filter(col("doc_id") % EvalSliceMod === 0))
        .groupBy(col("h")).agg(min(col("doc_id")).as("min_eval_doc"))
    }

  /** q118's per-doc span score frame over an ARBITRARY training docs
    * frame: windows join the broadcast eval artifact, per-doc hit
    * aggregates, window totals derived from the SAME frame. The literal
    * code path of batch q118 AND the streaming span gate. */
  private[graft] def spanScoresOver(docs: DataFrame,
      evalWins: DataFrame): DataFrame = {
    val totals = docs
      .select(col("doc_id"),
        greatest(size(tokens(col("text"))) - (SpanK - 1), lit(0))
          .cast("long").as("n_windows"))
    spanWindowsOver(docs).join(broadcast(evalWins), "h")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("h")).as("n_hit_windows"),
        count(lit(1)).as("n_hit_occurrences"),
        min(col("min_eval_doc")).as("min_eval_doc"))
      .join(totals, "doc_id")
      .select(col("doc_id"), col("n_hit_windows"), col("n_windows"),
        floor(lit(1000000.0) * col("n_hit_windows").cast(DoubleType) /
          col("n_windows").cast(DoubleType)).cast("long").as("hit_frac_u"),
        col("n_hit_occurrences"), col("min_eval_doc"))
  }

  private def q118(spark: SparkSession, dir: String): DataFrame =
    spanScores(spark, dir).orderBy(col("doc_id"))

  /** q118's per-doc score frame, memoized per (session, dir) —
    * [[contamScores]]' posture for the span gate: q118 presents it and
    * q119's triage re-aggregates it. */
  private[graft] def spanScores(spark: SparkSession, dir: String): DataFrame =
    Features.cachedFrame(spark, s"$dir#spanScores") {
      spanScoresOver(
        Tables.documents(spark, dir)
          .filter(col("doc_id") % EvalSliceMod =!= 0),
        evalSpanWindows(spark, dir))
    }

  private lazy val q118Sql =
    s"""WITH wins AS (
       |  SELECT doc_id, ${md5u32Sql("w")} AS h FROM (
       |    SELECT doc_id, unnest(${ngramOccurrencesSql("text", SpanK)}) AS w
       |    FROM documents)),
       |ev AS (
       |  SELECT h, min(doc_id) AS min_eval_doc FROM wins
       |  WHERE doc_id % $EvalSliceMod = 0 GROUP BY h),
       |train AS (SELECT doc_id, h FROM wins WHERE doc_id % $EvalSliceMod <> 0),
       |totals AS (
       |  SELECT doc_id,
       |    CAST(greatest(len(${tokensSql("text")}) - ${SpanK - 1}, 0) AS BIGINT)
       |      AS n_windows
       |  FROM documents WHERE doc_id % $EvalSliceMod <> 0),
       |hits AS (
       |  SELECT t.doc_id, count(DISTINCT t.h) AS n_hit_windows,
       |    count(*) AS n_hit_occurrences, min(e.min_eval_doc) AS min_eval_doc
       |  FROM train t JOIN ev e ON t.h = e.h GROUP BY 1)
       |SELECT h.doc_id, CAST(n_hit_windows AS BIGINT) AS n_hit_windows,
       |  tt.n_windows,
       |  CAST(floor(1000000.0 * CAST(n_hit_windows AS DOUBLE) /
       |    CAST(tt.n_windows AS DOUBLE)) AS BIGINT) AS hit_frac_u,
       |  CAST(n_hit_occurrences AS BIGINT) AS n_hit_occurrences,
       |  min_eval_doc
       |FROM hits h JOIN totals tt USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q119
  /** CONTAMINATION TRIAGE PER SOURCE — the dashboard row over the two
    * verbatim decontamination gates: per feed, how many training
    * documents each gate flags (q73's 3-gram overlap, q118's 8-word
    * exact window) and the contamination rate in micro-units. The
    * per-source view is what an operations team acts on — one feed
    * with an outsized rate is a scraper that ingests the benchmark's
    * host (cut the feed), while a uniform rate is benchmark text
    * genuinely endemic to the web (tighten the gate) — and the
    * 3-gram-vs-8-gram spread per feed shows how much of the cheap
    * gate's firing is long-verbatim (real) vs short-phrase noise.
    *
    * Scale posture: both gates' per-doc hit sets are q73/q118's plans
    * (broadcast eval side, no training shuffle); the triage adds one
    * narrow doc→source join per gate and a sources-sized
    * partial-aggregable groupBy. */
  private def q119(spark: SparkSession, dir: String): DataFrame = {
    val srcs = Tables.documents(spark, dir)
      .filter(col("doc_id") % EvalSliceMod =!= 0)
      .select(col("doc_id"), col("source"))
    val ngram = contamScores(spark, dir).select(col("doc_id"), lit(1L).as("g3"))
    val span = spanScores(spark, dir).select(col("doc_id"), lit(1L).as("g8"))
    srcs
      .join(ngram, Seq("doc_id"), "left")
      .join(span, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("g3"), lit(0L))).as("n_3gram"),
        sum(coalesce(col("g8"), lit(0L))).as("n_8gram"))
      .withColumn("rate3_u",
        floor(lit(1000000.0) * col("n_3gram").cast(DoubleType) /
          col("n_docs").cast(DoubleType)).cast("long"))
      .withColumn("rate8_u",
        floor(lit(1000000.0) * col("n_8gram").cast(DoubleType) /
          col("n_docs").cast(DoubleType)).cast("long"))
      .orderBy(col("source"))
  }

  private lazy val q119Sql =
    s"""WITH g3 AS (SELECT doc_id FROM ($q73Sql)),
       |g8 AS (SELECT doc_id FROM ($q118Sql)),
       |srcs AS (
       |  SELECT doc_id, source FROM documents
       |  WHERE doc_id % $EvalSliceMod <> 0),
       |j AS (
       |  SELECT s.source,
       |    CASE WHEN g3.doc_id IS NOT NULL THEN 1 ELSE 0 END AS f3,
       |    CASE WHEN g8.doc_id IS NOT NULL THEN 1 ELSE 0 END AS f8
       |  FROM srcs s
       |  LEFT JOIN g3 ON s.doc_id = g3.doc_id
       |  LEFT JOIN g8 ON s.doc_id = g8.doc_id)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(f3) AS BIGINT) AS n_3gram,
       |  CAST(sum(f8) AS BIGINT) AS n_8gram,
       |  CAST(floor(1000000.0 * CAST(sum(f3) AS DOUBLE) /
       |    CAST(count(*) AS DOUBLE)) AS BIGINT) AS rate3_u,
       |  CAST(floor(1000000.0 * CAST(sum(f8) AS DOUBLE) /
       |    CAST(count(*) AS DOUBLE)) AS BIGINT) AS rate8_u
       |FROM j GROUP BY source
       |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q120
  /** DEDUP SAVINGS IN TOKEN MASS — the budget view of q70's per-source
    * drop report: duplicate DOCUMENTS vary wildly in length, so the
    * number a training team actually banks is dropped TOKENS, not
    * dropped docs (a feed dropping 10% of docs can be dropping 2% or
    * 40% of its token mass). Per source: total/kept/dropped tokens
    * under q60's keep decisions and the micro-unit savings rate —
    * alongside q70's doc-count rate, the pair tells whether a feed's
    * duplication is short-spam (docs ≫ tokens) or mirror-bulk
    * (tokens ≫ docs). Closes the dedup observability family's
    * token-mass gap (q70 docs, q110 cluster profile, q82 overlap —
    * none weigh by length).
    *
    * Scale posture: rides the memoized CC labels (pairs-bounded, tiny
    * next to the corpus) via one broadcast left join onto the token
    * scan, then ONE sources-sized partial-aggregable groupBy — the
    * marginal cost over q70 is the token count already computed at
    * scan position. */
  private def q120(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
    val lbl = ccLabels(spark, dir)
      .select(col("id"), col("lbl"))
    toks.join(broadcast(lbl), col("doc_id") === col("id"), "left")
      .withColumn("keep",
        coalesce(col("lbl"), col("doc_id")) === col("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(col("keep"), col("n_tokens")).otherwise(0L))
          .as("kept_tokens"),
        sum(when(col("keep"), 0L).otherwise(col("n_tokens")))
          .as("dropped_tokens"))
      .withColumn("savings_u",
        floor(lit(1000000.0) * col("dropped_tokens").cast(DoubleType) /
          col("total_tokens").cast(DoubleType)).cast("long"))
      .orderBy(col("source"))
  }

  private lazy val q120Sql =
    s"""WITH RECURSIVE
       |$ccLabelsSqlCtes,
       |toks AS (
       |  SELECT doc_id, source,
       |    CAST(len(${tokensSql("text")}) AS BIGINT) AS n_tokens
       |  FROM documents),
       |dec AS (
       |  SELECT t.source, t.n_tokens,
       |    coalesce(l.lbl, t.doc_id) = t.doc_id AS keep
       |  FROM toks t LEFT JOIN labels l ON l.id = t.doc_id)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT)
       |    AS kept_tokens,
       |  CAST(sum(CASE WHEN keep THEN 0 ELSE n_tokens END) AS BIGINT)
       |    AS dropped_tokens,
       |  CAST(floor(1000000.0 *
       |    CAST(sum(CASE WHEN keep THEN 0 ELSE n_tokens END) AS DOUBLE) /
       |    CAST(sum(n_tokens) AS DOUBLE)) AS BIGINT) AS savings_u
       |FROM dec GROUP BY source
       |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q122
  /** SOURCE MARGINAL-NOVELTY ATTRIBUTION — the greedy data-valuation
    * read an acquisition team runs before paying for a feed: order the
    * sources deterministically (source name here; production swaps in
    * an acquisition-priority rank table — same broadcast shape), walk
    * them in order, and credit each distinct word-3-gram to the FIRST
    * source containing it. A feed's novel-shingle mass is its marginal
    * contribution to the corpus at its position in the order — a feed
    * whose novelty rate craters is reselling content the corpus
    * already has (q82 shows WHICH pair overlaps; this prices each
    * feed's residual value under the whole prefix, the
    * greedy-submodular number data-buying decisions use).
    *
    * Scale posture: distinct (source, h) is one partial-aggregable
    * groupBy over the memoized hashed-shingle features (8-byte hashes,
    * never strings); ownership is a second partial-aggregable groupBy
    * on the uniform hash key — a shingle shared by 10⁶ documents is
    * ONE row per source here, so the viral-dup skew cannot arise
    * (q82's argument); the report is sources-sized.
    *
    * The first-owner aggregate runs over a DICTIONARY-ENCODED source
    * rank, not the source string: `min(string)` carries a string
    * aggregation buffer, which is not hash-aggregable — it demoted
    * both the partial and final aggregates of the corpus-scale
    * (h, source) frame to SortAggregate (the round-12 plan audit's
    * only genuine demotion). Sources are a tiny dimension, so the
    * name→rank table broadcasts, `min(int)` rides HashAggregate, and
    * rank order == name order keeps the owner — and the oracle hash —
    * identical. Pinned SortAggregate-free in `PlanShapeSpec`. */
  private def q122(spark: SparkSession, dir: String): DataFrame = {
    val docsSrc = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
    // sources-sized frame; the unpartitioned rank window is bounded by
    // the dimension's cardinality, never the corpus.
    val srcRank = docsSrc.select(col("source")).distinct()
      .withColumn("src_rank",
        row_number().over(Window.orderBy(col("source"))).cast("int"))
    val srcShingles = Features.hashedShingles(spark, dir)
      .join(docsSrc.join(broadcast(srcRank), "source")
        .select(col("doc_id"), col("src_rank")), "doc_id")
      .select(col("src_rank"), col("h")).distinct()
    val owners = srcShingles.groupBy(col("h"))
      .agg(min(col("src_rank")).as("owner_rank"))
    val perSource = srcShingles.groupBy(col("src_rank"))
      .agg(count(lit(1)).as("n_distinct"))
    val novel = owners.groupBy(col("owner_rank").as("src_rank"))
      .agg(count(lit(1)).as("n_novel"))
    perSource.join(novel, Seq("src_rank"), "left")
      .join(broadcast(srcRank), Seq("src_rank"))
      .na.fill(0L, Seq("n_novel"))
      .withColumn("novelty_u",
        floor(lit(1000000.0) * col("n_novel").cast(DoubleType) /
          col("n_distinct").cast(DoubleType)).cast("long"))
      .select(col("source"), col("n_distinct"), col("n_novel"),
        col("novelty_u"))
      .orderBy(col("source"))
  }

  private lazy val q122Sql =
    s"""WITH sh AS (
       |  SELECT DISTINCT d.source, ${md5u32Sql("w")} AS h
       |  FROM ($docShinglesSql) s JOIN documents d USING (doc_id)),
       |owners AS (SELECT h, min(source) AS owner FROM sh GROUP BY h),
       |per_source AS (
       |  SELECT source, count(*) AS n_distinct FROM sh GROUP BY source),
       |novel AS (
       |  SELECT owner AS source, count(*) AS n_novel FROM owners GROUP BY owner)
       |SELECT p.source, p.n_distinct,
       |  CAST(coalesce(n.n_novel, 0) AS BIGINT) AS n_novel,
       |  CAST(floor(1000000.0 * CAST(coalesce(n.n_novel, 0) AS DOUBLE) /
       |    CAST(p.n_distinct AS DOUBLE)) AS BIGINT) AS novelty_u
       |FROM per_source p LEFT JOIN novel n USING (source)
       |ORDER BY p.source""".stripMargin

  // ---------------------------------------------------------------- q123
  /** SOFT-DEDUP WEIGHTS — the downweight-instead-of-drop alternative to
    * q60's binary keep/drop: every document in a near-dup cluster of
    * size m carries sampling weight 1/m (micro-units), singletons carry
    * 1.0, so each duplicated CONTENT contributes exactly one unit of
    * expected training mass wherever its copies came from. Training
    * teams run this when hard dedup would throw away provenance
    * diversity (the same license text from 40 feeds is worth ONE unit,
    * but which feed's copy survives should not be an arbitrary min-id
    * coin toss at sampling time). The report is per source: raw docs,
    * clustered docs, and the effective corpus size Σ 1/m — the number
    * that replaces `n_docs` in every mixing budget (q75/q103) under
    * soft dedup.
    *
    * Determinism: per-doc weights are floor(10⁶/m) literals (exact
    * int64 everywhere); the per-source effective mass is an exact
    * int64 sum of those literals. Quantization floor: a cluster of
    * m > 10⁶ copies floors to weight 0 and its one content unit drops
    * from the report — at that scale one unit among an effective
    * corpus of ≥ 10⁶ is below micro-unit resolution by construction;
    * a deployment tracking mega-clusters individually raises the
    * fixed-point scale (nano-units hold m ≤ 10⁹) rather than
    * clamping, which would over-count (m clamped 1μ weights sum to
    * m μ, not one unit).
    *
    * Scale posture: rides the memoized CC labels exactly like q60 —
    * cluster sizes are one partial-aggregable groupBy on the
    * pairs-bounded label table, the corpus takes one broadcast-able
    * left join against it, and the report is sources-sized. */
  private def q123(spark: SparkSession, dir: String): DataFrame = {
    val sizes = ccLabels(spark, dir).groupBy(col("lbl"))
      .agg(count(lit(1)).as("sz"))
    val labeled = ccLabels(spark, dir).join(sizes, "lbl")
      .select(col("id"), col("sz"))
    Tables.documents(spark, dir).select(col("doc_id"), col("source"))
      .join(labeled, col("doc_id") === col("id"), "left")
      .withColumn("w_u",
        when(col("sz").isNull, lit(1000000L))
          .otherwise((lit(1000000L) - pmod(lit(1000000L), col("sz"))) / col("sz"))
          .cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("sz").isNotNull, 1L).otherwise(0L)).as("n_clustered"),
        sum(col("w_u")).as("effective_docs_u"))
      .orderBy(col("source"))
  }

  private lazy val q123Sql =
    s"""WITH RECURSIVE
       |$ccLabelsSqlCtes,
       |sizes AS (SELECT lbl, count(*) AS sz FROM labels GROUP BY lbl),
       |labeled AS (
       |  SELECT l.id, s.sz FROM labels l JOIN sizes s USING (lbl)),
       |weighted AS (
       |  SELECT d.source,
       |    CASE WHEN lb.sz IS NULL THEN 1 ELSE 0 END AS singleton,
       |    CASE WHEN lb.sz IS NULL THEN 1000000
       |         ELSE CAST((1000000 - (1000000 % lb.sz)) / lb.sz AS BIGINT)
       |    END AS w_u
       |  FROM documents d LEFT JOIN labeled lb ON lb.id = d.doc_id)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(1 - singleton) AS BIGINT) AS n_clustered,
       |  CAST(sum(w_u) AS BIGINT) AS effective_docs_u
       |FROM weighted GROUP BY source
       |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q129
  /** LSH BANDING-RECALL AUDIT — the parameter-honesty check for the
    * banding step itself: over the rare-shingle candidates' EXACT
    * Jaccard scores (q37's verified pairs, the sketch-free reference),
    * how many pairs in each Jaccard band would the production
    * [[LshBands]]×[[LshRows]] MinHash banding join actually surface
    * (some band's 4 signature components all agree)? Reported against
    * the theoretical S-curve capture probability 1−(1−J^r)^b at the
    * band midpoint. q96 audits the minhash ESTIMATE against the exact
    * metric; this audits the CANDIDATE-GENERATION step — the one place
    * a dedup cascade silently loses real pairs (a banding miss never
    * reaches the verifier, so no downstream audit can see it without
    * this sketch-free reference leg). Measured recall far under theory
    * means a broken permutation family or band hash; recall AT theory
    * but below the pipeline's target means b/r need retuning — two
    * different fixes, distinguishable only with both columns.
    *
    * Determinism: the exact leg is integer set arithmetic; caught is
    * an exact equality test on int64 signature components; the theory
    * column is a JVM-computed micro-unit literal interpolated into
    * BOTH engines (no libm pow parity risk); buckets are one floor on
    * the bit-identical Jaccard double.
    *
    * Scale posture: the audit population is the df-capped candidate
    * set (bounded, never all-pairs — at 100 TB it runs over a pair
    * sample exactly like q113's exact leg); signatures come from the
    * memoized [[minhashSig]] table via two id-keyed joins; the report
    * is ≤ 3 rows. */
  private val BandRecallTheoryU: Map[Long, Long] =
    (1L to 3L).map { jb =>
      val mid = 0.25 * jb + 0.125
      val capture = 1.0 - math.pow(1.0 - math.pow(mid, LshRows), LshBands)
      jb -> math.floor(1000000.0 * capture).toLong
    }.toMap

  private def q129(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashSig(spark, dir)
    val sa = sig.toDF("a_doc" +: (0 until MinHashK).map(i => s"a_m$i"): _*)
    val sb = sig.toDF("b_doc" +: (0 until MinHashK).map(i => s"b_m$i"): _*)
    val bandHit = (0 until LshBands).map { b =>
      (0 until LshRows)
        .map(r => col(s"a_m${b * LshRows + r}") === col(s"b_m${b * LshRows + r}"))
        .reduce(_ && _)
    }.reduce(_ || _)
    val theory = BandRecallTheoryU.foldLeft(lit(0L)) { case (acc, (jb, t)) =>
      when(col("j_band") === jb, lit(t)).otherwise(acc)
    }
    jaccardScoredPairs(spark, dir)
      .filter(col("jaccard") >= 0.25)
      .join(sa, col("doc_a") === col("a_doc"))
      .join(sb, col("doc_b") === col("b_doc"))
      .withColumn("caught", when(bandHit, 1L).otherwise(0L))
      .withColumn("j_band",
        least(lit(3L), floor(col("jaccard") * 4.0).cast("long")))
      .groupBy(col("j_band"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("caught")).as("n_caught"))
      .withColumn("recall_u",
        floor(lit(1000000.0) * col("n_caught").cast(DoubleType) /
          col("n_pairs").cast(DoubleType)).cast("long"))
      .withColumn("theory_u", theory)
      .orderBy(col("j_band"))
  }

  /** The exact-Jaccard reference-pair + signature CTE chain shared by
    * q129's recall audit and q142's parameter sweep (ends at `pairs` +
    * `sig`). */
  private lazy val bandingAuditSqlCtes = {
    val mins = (0 until MinHashK)
      .map(i => s"min(${permSql(i, "s")}) AS m$i").mkString(",\n    ")
    s"""sh AS (
       |  SELECT doc_id, ${shinglesSql("text")} AS ss
       |  FROM documents),
       |post AS (SELECT doc_id, ${md5u32Sql("w")} AS s
       |         FROM (SELECT doc_id, unnest(ss) AS w FROM sh)),
       |rare_s AS (SELECT s FROM post GROUP BY s HAVING count(*) <= $ShingleDfCap),
       |rare AS (SELECT doc_id, p.s FROM post p JOIN rare_s USING (s)),
       |cand AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM rare x JOIN rare y ON x.s = y.s AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2
       |  HAVING count(*) >= 2),
       |scored AS (
       |  SELECT doc_a, doc_b,
       |    CAST(len(list_intersect(sa.ss, sb.ss)) AS BIGINT) AS n_common,
       |    CAST(len(sa.ss) AS BIGINT) + CAST(len(sb.ss) AS BIGINT) AS n_total
       |  FROM cand
       |  JOIN sh sa ON sa.doc_id = doc_a
       |  JOIN sh sb ON sb.doc_id = doc_b),
       |pairs AS (
       |  SELECT doc_a, doc_b,
       |    CAST(n_common AS DOUBLE) / CAST(n_total - n_common AS DOUBLE)
       |      AS jaccard
       |  FROM scored WHERE n_common >= 2),
       |sig AS (
       |  SELECT doc_id,
       |    $mins
       |  FROM post GROUP BY doc_id)""".stripMargin
  }

  private lazy val q129Sql = {
    val bandHit = (0 until LshBands).map { b =>
      (0 until LshRows)
        .map(r => s"sa.m${b * LshRows + r} = sb.m${b * LshRows + r}")
        .mkString("(", " AND ", ")")
    }.mkString(" OR ")
    val theory = (1L to 3L)
      .map(jb => s"WHEN $jb THEN ${BandRecallTheoryU(jb)}")
      .mkString("CASE j_band ", " ", " ELSE 0 END")
    s"""WITH $bandingAuditSqlCtes,
       |flagged AS (
       |  SELECT least(3, CAST(floor(jaccard * 4.0) AS BIGINT)) AS j_band,
       |    CASE WHEN $bandHit THEN 1 ELSE 0 END AS caught
       |  FROM pairs
       |  JOIN sig sa ON sa.doc_id = doc_a
       |  JOIN sig sb ON sb.doc_id = doc_b
       |  WHERE jaccard >= 0.25)
       |SELECT j_band, count(*) AS n_pairs,
       |  CAST(sum(caught) AS BIGINT) AS n_caught,
       |  CAST(floor(1000000.0 * CAST(sum(caught) AS DOUBLE) /
       |    CAST(count(*) AS DOUBLE)) AS BIGINT) AS recall_u,
       |  $theory AS theory_u
       |FROM flagged GROUP BY j_band
       |ORDER BY j_band""".stripMargin
  }

  // ---------------------------------------------------------------- q142
  /** BANDING PARAMETER SWEEP — the tuning table behind q129's
    * single-configuration audit: the SAME 16 stored permutations
    * regrouped as every power-of-two (bands × rows) split — 16×1,
    * 8×2, 4×4 (production), 2×8, 1×16 — each measured against the
    * exact-Jaccard reference pairs per J band, next to its theoretical
    * S-curve 1−(1−J^r)^b. This is the table a dedup-tuning session
    * actually reads: more bands ⇒ higher recall AND more candidate
    * pairs to verify (16×1 is "any perm agrees" — near-total recall,
    * maximal verify load), fewer bands ⇒ the opposite cliff; the sweep
    * shows where measured recall falls off the theory curve for THIS
    * corpus, without re-sketching anything (regrouping is free — a
    * real retune only rewrites the band-bucket join keys).
    *
    * Scale posture: identical population to q129 (df-capped reference
    * pairs — bounded, never all-pairs; signatures from the shared
    * 16-perm aggregate via two id-keyed joins); the sweep adds a
    * 5-struct explode per pair (constant fan-out) into one
    * ≤ 15-cell partial-aggregable groupBy; theory is JVM literals, no
    * pow() in either plan. */
  private val SweepConfigs = Seq((16, 1), (8, 2), (4, 4), (2, 8), (1, 16))

  private def sweepTheoryU(bands: Int, rows: Int, jb: Long): Long = {
    val mid = 0.25 * jb + 0.125
    math.floor(1000000.0 *
      (1.0 - math.pow(1.0 - math.pow(mid, rows), bands))).toLong
  }

  private def q142(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashSig(spark, dir)
    val sa = sig.toDF("a_doc" +: (0 until MinHashK).map(i => s"a_m$i"): _*)
    val sb = sig.toDF("b_doc" +: (0 until MinHashK).map(i => s"b_m$i"): _*)
    def hitFor(bands: Int, rows: Int): Column =
      (0 until bands).map { b =>
        (0 until rows)
          .map(r => col(s"a_m${b * rows + r}") === col(s"b_m${b * rows + r}"))
          .reduce(_ && _)
      }.reduce(_ || _)
    val sweep = array(SweepConfigs.map { case (b, r) =>
      struct(lit(b.toLong).as("n_bands"), lit(r.toLong).as("n_rows"),
        when(hitFor(b, r), 1L).otherwise(0L).as("caught"))
    }: _*)
    val theory = SweepConfigs.flatMap { case (b, r) =>
      (1L to 3L).map(jb => ((b, jb), sweepTheoryU(b, r, jb)))
    }.foldLeft(lit(0L)) { case (acc, ((b, jb), t)) =>
      when(col("n_bands") === b && col("j_band") === jb, lit(t)).otherwise(acc)
    }
    jaccardScoredPairs(spark, dir)
      .filter(col("jaccard") >= 0.25)
      .join(sa, col("doc_a") === col("a_doc"))
      .join(sb, col("doc_b") === col("b_doc"))
      .withColumn("j_band",
        least(lit(3L), floor(col("jaccard") * 4.0).cast("long")))
      .select(col("j_band"), explode(sweep).as("c"))
      .groupBy(col("c.n_bands").as("n_bands"), col("c.n_rows").as("n_rows"),
        col("j_band"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("c.caught")).as("n_caught"))
      .withColumn("recall_u",
        floor(lit(1000000.0) * col("n_caught").cast(DoubleType) /
          col("n_pairs").cast(DoubleType)).cast("long"))
      .withColumn("theory_u", theory)
      .orderBy(col("n_bands"), col("j_band"))
  }

  private lazy val q142Sql = {
    def hitSql(bands: Int, rows: Int): String =
      (0 until bands).map { b =>
        (0 until rows)
          .map(r => s"sa.m${b * rows + r} = sb.m${b * rows + r}")
          .mkString("(", " AND ", ")")
      }.mkString(" OR ")
    val caughtCols = SweepConfigs.map { case (b, r) =>
      s"CASE WHEN ${hitSql(b, r)} THEN 1 ELSE 0 END AS c_b$b"
    }.mkString(",\n    ")
    val arms = SweepConfigs.map { case (b, r) =>
      s"SELECT CAST($b AS BIGINT) AS n_bands, CAST($r AS BIGINT) AS n_rows," +
        s" j_band, c_b$b AS caught FROM flagged"
    }.mkString("\n  UNION ALL ")
    val theory = SweepConfigs.flatMap { case (b, r) =>
      (1L to 3L).map(jb =>
        s"WHEN n_bands = $b AND j_band = $jb THEN ${sweepTheoryU(b, r, jb)}")
    }.mkString("CASE ", " ", " ELSE 0 END")
    s"""WITH $bandingAuditSqlCtes,
       |flagged AS (
       |  SELECT least(3, CAST(floor(jaccard * 4.0) AS BIGINT)) AS j_band,
       |    $caughtCols
       |  FROM pairs
       |  JOIN sig sa ON sa.doc_id = doc_a
       |  JOIN sig sb ON sb.doc_id = doc_b
       |  WHERE jaccard >= 0.25),
       |sw AS (
       |  $arms)
       |SELECT n_bands, n_rows, j_band, count(*) AS n_pairs,
       |  CAST(sum(caught) AS BIGINT) AS n_caught,
       |  CAST(floor(1000000.0 * CAST(sum(caught) AS DOUBLE) /
       |    CAST(count(*) AS DOUBLE)) AS BIGINT) AS recall_u,
       |  $theory AS theory_u
       |FROM sw GROUP BY 1, 2, 3
       |ORDER BY n_bands, j_band""".stripMargin
  }

  // ---------------------------------------------------------------- q146
  /** NEAR-DUP DEGREE PROFILE — the hub view of the duplication graph,
    * orthogonal to q110's cluster-size view: q110 counts COMPONENTS
    * (how big do transitive groups get), this counts per-document
    * DEGREE over the verified pair table (how many direct partners a
    * document has, at Jaccard ≥ 0.5). The two disagree exactly where
    * it matters: a chain of k near-identical revisions is one size-k
    * cluster of degree-≤2 documents (benign versioning), while a
    * template document partially shared by k pages is a degree-k HUB
    * whose component may never transitively close — the
    * boilerplate-at-the-document-level signal q81's n-gram view can
    * only aggregate corpus-wide. Bands 1 / 2 / 3-4 / 5+, with each
    * band's worst degree — a growing 5+ band with rising max degree
    * means template chrome is entering the corpus.
    *
    * Scale posture: rides the MEMOIZED verified pair table (df-capped
    * candidates, bounded — built once per session, shared with
    * q37/q88/q96/q129/q142); degree is one union + one
    * partial-aggregable groupBy of the pairs-sized frame; the report
    * is ≤ 4 cells. */
  private def q146(spark: SparkSession, dir: String): DataFrame = {
    val pairs = jaccardScoredPairs(spark, dir).filter(col("jaccard") >= 0.5)
    val deg = pairs.select(col("doc_a").as("id"))
      .unionByName(pairs.select(col("doc_b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
    val band = when(col("degree") === 1L, "1")
      .when(col("degree") === 2L, "2")
      .when(col("degree") <= 4L, "3-4")
      .otherwise("5+")
    val bandRank = when(col("degree_band") === "1", 0)
      .when(col("degree_band") === "2", 1)
      .when(col("degree_band") === "3-4", 2)
      .otherwise(3)
    deg.select(band.as("degree_band"), col("degree"))
      .groupBy(col("degree_band"))
      .agg(count(lit(1)).as("n_docs"), max(col("degree")).as("max_degree"))
      .orderBy(bandRank)
  }

  private lazy val q146Sql =
    s"""WITH $bandingAuditSqlCtes,
       |vp AS (
       |  SELECT doc_a, doc_b FROM pairs WHERE jaccard >= 0.5),
       |deg AS (
       |  SELECT id, count(*) AS degree FROM (
       |    SELECT doc_a AS id FROM vp
       |    UNION ALL SELECT doc_b AS id FROM vp)
       |  GROUP BY id)
       |SELECT CASE WHEN degree = 1 THEN '1'
       |            WHEN degree = 2 THEN '2'
       |            WHEN degree <= 4 THEN '3-4'
       |            ELSE '5+' END AS degree_band,
       |  count(*) AS n_docs,
       |  CAST(max(degree) AS BIGINT) AS max_degree
       |FROM deg
       |GROUP BY 1
       |ORDER BY CASE degree_band WHEN '1' THEN 0 WHEN '2' THEN 1
       |         WHEN '3-4' THEN 2 ELSE 3 END""".stripMargin

  // ---------------------------------------------------------------- q132
  /** VERBATIM-SPAN SEVERITY — the "how long is the overlap" number a
    * contamination report publishes next to q118's hit counts: for
    * every doc the 8-word window gate flags, the LONGEST RUN of
    * consecutive hit windows, converted to words (run + SpanK − 1 =
    * the exact length of the longest common substring of ≥ [[SpanK]]
    * words with the eval slice). Hit-window COUNT cannot rank
    * severity: 40 scattered 8-word hits are boilerplate phrases, 40
    * consecutive ones are a 47-word verbatim benchmark passage — the
    * doc to quarantine first. Runs come from the gaps-and-islands
    * rewrite (pos − row_number over hit positions is constant within a
    * run), the standard relational form of consecutive-run detection.
    *
    * Scale posture: q118's exact plan (broadcast eval windows, the
    * training side streams) with window POSITIONS kept (8 bytes more
    * per window); the islands window partitions by doc_id over
    * HIT rows only — flagged-docs-sized, not corpus-sized — and the
    * report is one partial-aggregable groupBy over the same rows. */
  private def q132(spark: SparkSession, dir: String): DataFrame = {
    val wins = Tables.documents(spark, dir)
      .filter(col("doc_id") % EvalSliceMod =!= 0)
      .select(col("doc_id"),
        posexplode(ngramOccurrences(col("text"), SpanK)).as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        md5u32(col("w")).as("h"))
    val hits = wins
      .join(broadcast(evalSpanWindows(spark, dir).select(col("h"))), "h")
      .select(col("doc_id"), col("pos")).distinct()
    val wIsl = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    hits
      .withColumn("grp", col("pos") - row_number().over(wIsl))
      .groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("run"))
      .groupBy(col("doc_id"))
      // Σ runs counts hit POSITIONS — each position is one window
      // occurrence, so this equals q118's n_hit_occurrences (NOT its
      // countDistinct-hash n_hit_windows: a doc repeating the same hit
      // 8-gram at two positions has 2 occurrences but 1 distinct hash).
      .agg(sum(col("run")).as("n_hit_occurrences"),
        max(col("run")).as("max_run"))
      .withColumn("longest_span_words", col("max_run") + (SpanK - 1))
      .select(col("doc_id"), col("n_hit_occurrences"), col("max_run"),
        col("longest_span_words"))
      .orderBy(col("longest_span_words").desc, col("doc_id"))
  }

  private lazy val q132Sql =
    s"""WITH base AS (
       |  SELECT doc_id, ${ngramOccurrencesSql("text", SpanK)} AS ws
       |  FROM documents WHERE doc_id % $EvalSliceMod <> 0),
       |wins AS (
       |  SELECT doc_id, pos, ${md5u32Sql("ws[pos + 1]")} AS h
       |  FROM (SELECT doc_id, ws,
       |          unnest(range(0, len(ws))) AS pos FROM base)),
       |ev AS (
       |  SELECT DISTINCT ${md5u32Sql("w")} AS h FROM (
       |    SELECT unnest(${ngramOccurrencesSql("text", SpanK)}) AS w
       |    FROM documents WHERE doc_id % $EvalSliceMod = 0)),
       |hits AS (
       |  SELECT DISTINCT doc_id, pos FROM wins JOIN ev USING (h)),
       |islands AS (
       |  SELECT doc_id,
       |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM hits),
       |runs AS (
       |  SELECT doc_id, grp, count(*) AS run
       |  FROM islands GROUP BY 1, 2)
       |SELECT doc_id,
       |  CAST(sum(run) AS BIGINT) AS n_hit_occurrences,
       |  CAST(max(run) AS BIGINT) AS max_run,
       |  CAST(max(run) + ${SpanK - 1} AS BIGINT) AS longest_span_words
       |FROM runs GROUP BY doc_id
       |ORDER BY longest_span_words DESC, doc_id""".stripMargin

  // ---------------------------------------------------------------- q160
  /** CLUSTER-PURITY AUDIT — external validation of the near-dup
    * clustering against the one ground truth the corpus carries for
    * free: the exact-content partition. Every unordered doc pair is
    * classified by the pair-counting (Rand) decomposition —
    * `content_pairs` (same content fingerprint), `cluster_pairs`
    * (co-clustered by q56's components, docs in no component counting
    * as singleton clusters), and `coclustered_pairs` (both). Two
    * derived columns are the audit's verdicts: `missed_pairs`
    * (content-equal yet NOT co-clustered — every one is a sketch-
    * recall failure, e.g. a doc too short to shingle, so the pair
    * never entered LSH), and `near_only_pairs` (co-clustered beyond
    * byte-equality — the near-dup mass the clustering exists to find,
    * reported as its own population, NOT as error). `exact_recall_u`
    * is the one-number gate: the fraction of exact-dup pairs the
    * production clustering recovers, in exact micro-units.
    *
    * This audits cluster STRUCTURE where q108 audits per-doc flags:
    * two methods can agree on "doc is a dup" while partitioning the
    * dups differently — only pair counting sees that. Companion to
    * q96/q98 (sketch fidelity) and q129 (banding recall): those audit
    * the sketches, this audits what the end-to-end pipeline DID.
    *
    * Scale posture: no pair is ever materialized — each leg is
    * Σ n·(n−1)/2 over a partial-aggregable group count (cells of the
    * cluster × content contingency table, clusters, content groups),
    * three tiny single-row aggregates cross-joined at the end. The
    * label table rides the memoized CC labels (pairs-bounded); the
    * corpus contributes one narrow fingerprint scan. Viral groups
    * cost int64 multiplications, not joins — the same reason q110's
    * histogram scales. */
  private def q160(spark: SparkSession, dir: String): DataFrame = {
    val lab = ccLabels(spark, dir)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), contentFp(col("text")).as("fp"))
      .join(lab, col("doc_id") === col("id"), "left")
      // docs outside every component are their own (negative) cluster
      .select(col("doc_id"), col("fp"),
        coalesce(col("lbl"), -col("doc_id") - 1L).as("lbl2"))
    def pairSum(keys: Seq[Column], out: String): DataFrame =
      docs.groupBy(keys: _*).agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(expr("(n * (n - 1)) div 2")), lit(0L)).as(out))
    val content = pairSum(Seq(col("fp")), "content_pairs")
    val cluster = pairSum(Seq(col("lbl2")), "cluster_pairs")
    val both = pairSum(Seq(col("lbl2"), col("fp")), "coclustered_pairs")
    content.crossJoin(cluster).crossJoin(both)
      .withColumn("missed_pairs",
        col("content_pairs") - col("coclustered_pairs"))
      .withColumn("near_only_pairs",
        col("cluster_pairs") - col("coclustered_pairs"))
      .withColumn("exact_recall_u",
        when(col("content_pairs") === 0L, lit(1000000L))
          .otherwise(expr("(1000000 * coclustered_pairs) div content_pairs")))
  }

  private val q160Sql =
    s"""WITH RECURSIVE
       |$ccLabelsSqlCtes,
       |dfp AS (
       |  SELECT d.doc_id, ${contentFpSql("d.text")} AS fp,
       |    COALESCE(l.lbl, -d.doc_id - 1) AS lbl2
       |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.id),
       |cont AS (SELECT CAST(COALESCE(sum((n * (n - 1)) // 2), 0) AS BIGINT)
       |    AS content_pairs
       |  FROM (SELECT count(*) AS n FROM dfp GROUP BY fp)),
       |clus AS (SELECT CAST(COALESCE(sum((n * (n - 1)) // 2), 0) AS BIGINT)
       |    AS cluster_pairs
       |  FROM (SELECT count(*) AS n FROM dfp GROUP BY lbl2)),
       |cocl AS (SELECT CAST(COALESCE(sum((n * (n - 1)) // 2), 0) AS BIGINT)
       |    AS coclustered_pairs
       |  FROM (SELECT count(*) AS n FROM dfp GROUP BY lbl2, fp))
       |SELECT content_pairs, cluster_pairs, coclustered_pairs,
       |  content_pairs - coclustered_pairs AS missed_pairs,
       |  cluster_pairs - coclustered_pairs AS near_only_pairs,
       |  CASE WHEN content_pairs = 0 THEN 1000000
       |       ELSE (1000000 * coclustered_pairs) // content_pairs
       |  END AS exact_recall_u
       |FROM cont CROSS JOIN clus CROSS JOIN cocl""".stripMargin

  // ---------------------------------------------------------------- q162
  /** DECONTAMINATION THRESHOLD SWEEP — the tuning table run BEFORE
    * committing to a contamination cutoff (q142's sweep discipline
    * applied to the decontamination family): for each candidate
    * threshold t ∈ {1, 2, 4, 8} matched eval 3-grams, the training
    * docs and char mass a `n_hits ≥ t` gate would quarantine, with
    * exact micro-unit rates. t = 1 is GPT-2/3-era any-overlap
    * paranoia (common-phrase false positives and all); the curve's
    * elbow is where real verbatim leakage separates from phrase
    * noise — the published-corpus decision this table prices openly.
    *
    * Scale posture: the expensive stage — per-doc eval-overlap counts —
    * is the SAME memoized [[contamScores]] frame q73 presents and
    * q119 re-aggregates (built once per session; `FeatureBuildOnceSpec`
    * pins it). The sweep itself never rescans the corpus: per-doc
    * hit counts collapse to a (n_hits → docs, chars) profile frame
    * bounded by the distinct-overlap domain, and the 4 thresholds
    * cross that tiny frame with conditional sums — adding a candidate
    * threshold costs literally nothing at 100 TB. */
  private def q162(spark: SparkSession, dir: String): DataFrame = {
    val train = Tables.documents(spark, dir)
      .filter(col("doc_id") % EvalSliceMod =!= 0)
      .select(col("doc_id"), col("n_chars"))
    val perDoc = train
      .join(contamScores(spark, dir).select(col("doc_id"), col("n_hits")),
        Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_hits"))
    // bounded profile: one row per distinct overlap count
    val profile = perDoc.groupBy(col("n_hits"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("chars"))
    val thresholds = spark.range(1)
      .select(explode(array(lit(1L), lit(2L), lit(4L), lit(8L)))
        .as("threshold"))
    broadcast(thresholds).crossJoin(profile)
      .groupBy(col("threshold"))
      .agg(
        sum(when(col("n_hits") >= col("threshold"), col("cnt"))
          .otherwise(0L)).as("flagged_docs"),
        sum(when(col("n_hits") >= col("threshold"), col("chars"))
          .otherwise(0L)).as("flagged_chars"),
        sum(col("cnt")).as("train_docs"))
      .withColumn("flag_rate_u",
        expr("(1000000 * flagged_docs) div train_docs"))
      .orderBy(col("threshold"))
  }

  private val q162Sql =
    s"""WITH words AS ($docShinglesSql),
       |hashed AS (SELECT doc_id, ${md5u32Sql("w")} AS h FROM words),
       |ev AS (SELECT h FROM hashed WHERE doc_id % $EvalSliceMod = 0),
       |tr AS (SELECT doc_id, h FROM hashed WHERE doc_id % $EvalSliceMod <> 0),
       |hits AS (
       |  SELECT t.doc_id, count(DISTINCT t.h) AS n_hits
       |  FROM tr t JOIN ev e ON t.h = e.h
       |  GROUP BY 1),
       |perdoc AS (
       |  SELECT d.doc_id, d.n_chars, COALESCE(h.n_hits, 0) AS n_hits
       |  FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
       |  WHERE d.doc_id % $EvalSliceMod <> 0),
       |thr AS (SELECT CAST(unnest([1, 2, 4, 8]) AS BIGINT) AS threshold)
       |SELECT threshold,
       |  CAST(sum(CASE WHEN n_hits >= threshold THEN 1 ELSE 0 END) AS BIGINT)
       |    AS flagged_docs,
       |  CAST(sum(CASE WHEN n_hits >= threshold THEN n_chars ELSE 0 END)
       |    AS BIGINT) AS flagged_chars,
       |  count(*) AS train_docs,
       |  (1000000 * CAST(sum(CASE WHEN n_hits >= threshold THEN 1 ELSE 0 END)
       |    AS BIGINT)) // count(*) AS flag_rate_u
       |FROM thr CROSS JOIN perdoc
       |GROUP BY threshold
       |ORDER BY threshold""".stripMargin

  // ---------------------------------------------------------------- q180
  /** CRAWL-RUN DUPLICATION AUDIT — the ADJACENCY view of exact
    * duplication the global audits here can't localize: q45/q110 say
    * HOW MUCH of a source is duplicate mass, this says whether it
    * arrived in RUNS — consecutive documents (crawl order = ingest-id
    * order) with identical content fingerprints, the signature of a
    * crawler stuck in a template loop, a pagination trap, or a
    * retrying feed, and operationally a different fix (repair the
    * crawler frontier) than scattered duplication (dedup the corpus).
    * Per source: document count, the number of ≥2-length identical
    * runs, documents inside such runs, the longest run, and the
    * micro-share of the source that arrived run-duplicated.
    *
    * Determinism: md5 fingerprints (q33's exact recipe — identical
    * hex in both engines); run boundaries are integer lag compares;
    * all counts exact int64, rates integer `div`.
    *
    * Scale posture: one narrow (doc_id, source, md5) scan, then the
    * SHARD-STITCHED lag + two-phase running break-sum
    * ([[Features.shardedLag]]/[[Features.shardedPrefixSum]]): each
    * shard's first row compares against the previous shard's last
    * fingerprint via a bounded edges frame, so run detection is exact
    * ACROSS shard seams and no sort task ever exceeds one shard —
    * bit-identical to the per-source global windows they replace. The
    * run re-aggregates are (source, run)-keyed and partial-
    * aggregable; output is sources-sized. */
  private def q180(spark: SparkSession, dir: String): DataFrame = {
    val shard = expr(s"doc_id div ${Features.prefixShardSize(spark)}")
    val lagged = Features.shardedLag(
      Tables.documents(spark, dir)
        .select(col("source"), col("doc_id"), md5(col("text")).as("fp")),
      Seq("source"), shard, col("doc_id"), col("fp"), "prev_fp")
      .withColumn("brk",
        when(col("prev_fp") === col("fp"), 0L).otherwise(1L))
    val runs = Features.shardedPrefixSum(lagged, Seq("source"), shard,
        Seq(col("doc_id")), col("brk"), "run_id", inclusive = true)
      .groupBy(col("source"), col("run_id"))
      .agg(count(lit(1)).as("run_len"))
    runs.groupBy(col("source"))
      .agg(sum(col("run_len")).as("n_docs"),
        sum(when(col("run_len") >= 2L, 1L).otherwise(0L)).as("n_runs"),
        sum(when(col("run_len") >= 2L, col("run_len")).otherwise(0L))
          .as("docs_in_runs"),
        max(col("run_len")).as("max_run"))
      .withColumn("run_share_u", expr("(1000000 * docs_in_runs) div n_docs"))
      .orderBy(col("run_share_u").desc, col("source"))
  }

  private val q180Sql =
    s"""WITH fp AS (
       |  SELECT source, doc_id, md5(text) AS fp FROM documents),
       |brk AS (
       |  SELECT source, doc_id, fp,
       |    CASE WHEN lag(fp) OVER (PARTITION BY source ORDER BY doc_id)
       |      = fp THEN 0 ELSE 1 END AS brk
       |  FROM fp),
       |runs AS (
       |  SELECT source, run_id, count(*) AS run_len FROM (
       |    SELECT source, CAST(sum(brk) OVER (PARTITION BY source
       |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
       |      CURRENT ROW) AS BIGINT) AS run_id
       |    FROM brk)
       |  GROUP BY 1, 2)
       |SELECT source,
       |  CAST(sum(run_len) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN run_len >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_runs,
       |  CAST(sum(CASE WHEN run_len >= 2 THEN run_len ELSE 0 END)
       |    AS BIGINT) AS docs_in_runs,
       |  max(run_len) AS max_run,
       |  (1000000 * CAST(sum(CASE WHEN run_len >= 2 THEN run_len ELSE 0
       |    END) AS BIGINT)) // CAST(sum(run_len) AS BIGINT) AS run_share_u
       |FROM runs GROUP BY source
       |ORDER BY run_share_u DESC, source""".stripMargin

  // ---------------------------------------------------------------- q189
  /** DUP-CLUSTER DENSITY AUDIT — the SHAPE of each near-dup component:
    * q56 reports the components and q110 their size histogram; this
    * reads each component's edge density — verified-pair edges over
    * possible pairs. A density-1 component is a CLIQUE (every member
    * pairwise-verified: a true duplicate set, safe to collapse to one
    * canonical); a sparse component is a CHAIN built by transitive
    * closure (A≈B≈C with A and C NOT verified similar — the
    * drift-merge a dedup budget must inspect before deleting, because
    * keep-one-per-cluster would drop documents never shown to
    * duplicate the survivor). The classic transitivity question asked
    * cluster-by-cluster — WITHOUT counting triangles, which explodes
    * as O(s³) on exactly the viral clusters that matter most; edge
    * density reads the same cliquishness from frames that already
    * exist.
    *
    * Determinism: exact integer counts; possible = s(s−1)/2 (an even
    * product — exact); density micro floor-div; shape bands are
    * integer CASE cuts.
    *
    * Scale posture: both inputs are memoized pairs-bounded frames
    * ([[ccLabels]], the q35 verified pairs); the audit is two
    * partial-aggregable groupBys and one cluster-keyed join on frames
    * tiny next to the corpus — no new corpus scan, no triangle
    * enumeration. */
  /** The density table over an arbitrary (labels, verified-pairs)
    * frame pair — ONE definition, read by q189 and by its spec's
    * hand-planted chain/clique graphs (text-level chain fixtures would
    * ride minhash luck; the formula is what needs pinning). */
  private[graft] def clusterDensityOver(labels: DataFrame,
      pairs: DataFrame): DataFrame = {
    val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("n_docs"))
    val edges = pairs.select(col("doc_a").as("id"))
      .join(labels, "id")
      .groupBy(col("lbl")).agg(count(lit(1)).as("n_edges"))
    sizes.join(edges, Seq("lbl"))
      .withColumn("possible", expr("(n_docs * (n_docs - 1)) div 2"))
      .withColumn("density_u", expr("(1000000 * n_edges) div possible"))
      .withColumn("shape",
        when(col("density_u") === 1000000L, lit("clique"))
          .when(col("density_u") >= 500000L, lit("dense"))
          .otherwise(lit("chain")))
      .select(col("lbl").as("cluster_id"), col("n_docs"), col("n_edges"),
        col("possible"), col("density_u"), col("shape"))
      .orderBy(col("density_u"), col("cluster_id"))
  }

  private def q189(spark: SparkSession, dir: String): DataFrame =
    clusterDensityOver(ccLabels(spark, dir),
      q35(spark, dir).select(col("doc_a"), col("doc_b")))

  private val q189Sql =
    s"""WITH RECURSIVE
       |$ccLabelsSqlCtes,
       |sizes AS (SELECT lbl, count(*) AS n_docs FROM labels GROUP BY 1),
       |ecnt AS (
       |  SELECT l.lbl, count(*) AS n_edges
       |  FROM pairs p JOIN labels l ON p.doc_a = l.id GROUP BY 1)
       |SELECT s.lbl AS cluster_id, s.n_docs, e.n_edges,
       |  (s.n_docs * (s.n_docs - 1)) // 2 AS possible,
       |  (1000000 * e.n_edges) // ((s.n_docs * (s.n_docs - 1)) // 2)
       |    AS density_u,
       |  CASE WHEN (1000000 * e.n_edges)
       |      // ((s.n_docs * (s.n_docs - 1)) // 2) = 1000000 THEN 'clique'
       |    WHEN (1000000 * e.n_edges)
       |      // ((s.n_docs * (s.n_docs - 1)) // 2) >= 500000 THEN 'dense'
       |    ELSE 'chain' END AS shape
       |FROM sizes s JOIN ecnt e ON s.lbl = e.lbl
       |ORDER BY density_u, cluster_id""".stripMargin

  // ----------------------------------------------------------------

  // ---------------------------------------------------------------- q247
  /** MINHASH PERMUTATION-COUNT SWEEP — the sizing table for the
    * signature WIDTH axis, completing the sweep family (q142 swept
    * banding, q158 PQ budgets, q166 nprobe, q162 thresholds): for
    * k ∈ {4, 8, 16} permutations, the estimator's mean absolute
    * error, mean signed bias, and worst error against exact Jaccard
    * over q35's verified pairs. The first k lanes of the 16-lane
    * signature ARE a valid k-perm MinHash (lanes are independent), so
    * the whole sweep reads the one memoized signature table — no
    * re-aggregation per k. The number this buys: whether a pipeline
    * can halve its signature storage (8 perms) before the error band
    * crosses its dedup threshold margin.
    *
    * Determinism: per-lane agreements are exact integer compares;
    * estimates/exacts micro-floored doubles (single IEEE rounding);
    * the means floor(sum/count) on doubles — identical both engines.
    *
    * Scale posture: rides the MEMOIZED signature table and verified
    * pairs (pairs-bounded frames); the shingle-set join is the q96
    * exact leg; 3 report rows. */
  private def q247(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashSig(spark, dir)
    val pairs = minhashVerifiedPairs(sig).select(col("doc_a"), col("doc_b"))
    val sa = sig.toDF(sig.columns.toIndexedSeq.map(c => s"a_$c"): _*)
    val sb = sig.toDF(sig.columns.toIndexedSeq.map(c => s"b_$c"): _*)
    val sh = Features.shingleSets(spark, dir)
    def matchesUpTo(k: Int): Column = (0 until k).map(i =>
      when(col(s"a_m$i") === col(s"b_m$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val base = pairs
      .join(sa, col("doc_a") === col("a_doc_id"))
      .join(sb, col("doc_b") === col("b_doc_id"))
      .join(sh.toDF("sa_doc", "a_ss"), col("doc_a") === col("sa_doc"))
      .join(sh.toDF("sb_doc", "b_ss"), col("doc_b") === col("sb_doc"))
      .withColumn("n_common",
        size(array_intersect(col("a_ss"), col("b_ss"))).cast("long"))
      .withColumn("n_union",
        (size(col("a_ss")) + size(col("b_ss"))).cast("long") -
          col("n_common"))
      .withColumn("exact_u",
        floor(lit(1000000.0) * col("n_common").cast(DoubleType) /
          col("n_union").cast(DoubleType)).cast("long"))
      .select(col("exact_u") +: Seq(4, 8, 16).map(k =>
        matchesUpTo(k).as(s"k$k")): _*)
    // One pass over base (r17): the unionAll-of-three-selects form
    // computed the 4-join base subtree once PER k (3× at sf0.1 — AQE
    // deduplicates none of it); exploding the per-k error structs fans
    // each base row out to the identical 3-row multiset in the same
    // scan. Bit-identical: same err_u expression per k, same rows.
    base.select(explode(array(Seq(4, 8, 16).map(k =>
        struct(lit(k.toLong).as("n_perms"),
          (floor(lit(1000000.0) * col(s"k$k").cast(DoubleType) /
            lit(k.toDouble)).cast("long") - col("exact_u")).as("err_u"))): _*))
        .as("b"))
      .select(col("b.n_perms").as("n_perms"), col("b.err_u").as("err_u"))
      .groupBy(col("n_perms"))
      .agg(count(lit(1)).as("n_pairs"),
        floor(sum(abs(col("err_u"))).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).cast("long")
          .as("mean_abs_err_u"),
        floor(sum(col("err_u")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).cast("long").as("mean_bias_u"),
        max(abs(col("err_u"))).as("max_abs_err_u"))
      .orderBy(col("n_perms"))
  }

  private lazy val q247Sql = {
    val mins = (0 until MinHashK)
      .map(i => s"min(${permSql(i, "h")}) AS m$i").mkString(",\n    ")
    val bandSelects = (0 until LshBands).map { b =>
      val ms = (0 until LshRows).map(r => s"m${b * LshRows + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws(',', $ms)) AS bh FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    def matches(k: Int) = (0 until k)
      .map(i => s"CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    val legs = Seq(4, 8, 16).map { k =>
      s"""SELECT $k AS n_perms,
         |    CAST(floor(1000000.0 * CAST(k$k AS DOUBLE) / $k.0) AS BIGINT)
         |      - exact_u AS err_u
         |  FROM base""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH sh AS (
       |  SELECT doc_id, ${shinglesSql("text")} AS ss
       |  FROM documents),
       |hashed AS (SELECT doc_id, ${md5u32Sql("w")} AS h
       |           FROM (SELECT doc_id, unnest(ss) AS w FROM sh)),
       |sig AS (
       |  SELECT doc_id,
       |    $mins
       |  FROM hashed GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2),
       |verified AS (
       |  SELECT doc_a, doc_b,
       |    ${matches(4)} AS k4, ${matches(8)} AS k8, ${matches(16)} AS k16
       |  FROM cand
       |  JOIN sig sa ON doc_a = sa.doc_id
       |  JOIN sig sb ON doc_b = sb.doc_id
       |  WHERE ${matches(MinHashK)} >= $MinHashMatchMin),
       |base AS (
       |  SELECT v.doc_a, v.doc_b, k4, k8, k16,
       |    CAST(floor(1000000.0 * CAST(len(list_intersect(a.ss, b.ss))
       |        AS DOUBLE) /
       |      CAST(len(a.ss) + len(b.ss) - len(list_intersect(a.ss, b.ss))
       |        AS DOUBLE)) AS BIGINT) AS exact_u
       |  FROM verified v
       |  JOIN sh a ON v.doc_a = a.doc_id
       |  JOIN sh b ON v.doc_b = b.doc_id),
       |errs AS (
       |  $legs)
       |SELECT n_perms, count(*) AS n_pairs,
       |  CAST(floor(CAST(sum(abs(err_u)) AS DOUBLE) / count(*))
       |    AS BIGINT) AS mean_abs_err_u,
       |  CAST(floor(CAST(sum(err_u) AS DOUBLE) / count(*))
       |    AS BIGINT) AS mean_bias_u,
       |  max(abs(err_u)) AS max_abs_err_u
       |FROM errs
       |GROUP BY n_perms
       |ORDER BY n_perms""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q250_hot_source_drill" -> (q250 _),
    "q247_perm_sweep" -> (q247 _),
    "q189_cluster_density" -> (q189 _),
    "q180_crawl_runs" -> (q180 _),
    "q160_cluster_purity" -> (q160 _),
    "q162_decontam_sweep" -> (q162 _),
    "q132_span_severity" -> (q132 _),
    "q129_banding_recall" -> (q129 _),
    "q122_source_novelty" -> (q122 _),
    "q123_soft_dedup_weights" -> (q123 _),
    "q120_dedup_savings" -> (q120 _),
    "q118_span_decontamination" -> (q118 _),
    "q119_contamination_triage" -> (q119 _),
    "q116_split_leakage" -> (q116 _),
    "q133_split_repair"  -> (q133 _),
    "q138_repetition_exposure" -> (q138 _),
    "q139_deletion_cascade" -> (q139 _),
    "q140_canonical_handoff" -> (q140 _),
    "q142_banding_sweep" -> (q142 _),
    "q146_dup_degree" -> (q146 _),
    "q108_method_agreement" -> (q108 _),
    "q218_dup_quality_phi" -> (q218 _),
    "q220_dup_trend" -> (q220 _),
    "q225_cluster_span" -> (q225 _),
    "q228_dup_distance" -> (q228 _),
    "q110_dup_histogram" -> (q110 _),
    "q85_span_dedup"     -> (q85 _),
    "q88_containment"    -> (q88 _),
    "q92_extended_funnel" -> (q92 _),
    "q96_sketch_fidelity" -> (q96 _),
    "q98_simhash_fidelity" -> (q98 _),
    "q82_source_overlap" -> (q82 _),
    "q34_content_dedup"  -> (q34 _),
    "q35_minhash_lsh"    -> (q35 _),
    "q36_simhash"        -> (q36 _),
    "q37_shingle_jaccard" -> (q37 _),
    "q45_exact_dedup"    -> (q45 _),
    "q54_edit_verify"    -> (q54 _),
    "q56_dedup_clusters" -> (q56 _),
    "q59_banded_edit"    -> (q59 _),
    "q60_dedup_decisions" -> (q60 _),
    "q69_incremental_dedup" -> (q69 _),
    "q70_dedup_report"   -> (q70 _),
    "q72_bloom_incremental" -> (q72 _),
    "q73_decontamination" -> (q73 _),
    "q78_curation_funnel" -> (q78 _),
    "q84_source_funnel"  -> (q84 _))

  val oracles: Map[String, String] = Map(
    "q250_hot_source_drill" -> q250Sql,
    "q247_perm_sweep" -> q247Sql,
    "q189_cluster_density" -> q189Sql,
    "q180_crawl_runs" -> q180Sql,
    "q160_cluster_purity" -> q160Sql,
    "q162_decontam_sweep" -> q162Sql,
    "q132_span_severity" -> q132Sql,
    "q129_banding_recall" -> q129Sql,
    "q122_source_novelty" -> q122Sql,
    "q123_soft_dedup_weights" -> q123Sql,
    "q120_dedup_savings" -> q120Sql,
    "q118_span_decontamination" -> q118Sql,
    "q119_contamination_triage" -> q119Sql,
    "q116_split_leakage" -> q116Sql,
    "q133_split_repair"  -> q133Sql,
    "q138_repetition_exposure" -> q138Sql,
    "q139_deletion_cascade" -> q139Sql,
    "q140_canonical_handoff" -> q140Sql,
    "q142_banding_sweep" -> q142Sql,
    "q146_dup_degree" -> q146Sql,
    "q108_method_agreement" -> q108Sql,
    "q218_dup_quality_phi" -> q218Sql,
    "q220_dup_trend" -> q220Sql,
    "q225_cluster_span" -> q225Sql,
    "q228_dup_distance" -> q228Sql,
    "q110_dup_histogram" -> q110Sql,
    "q85_span_dedup"     -> q85Sql,
    "q88_containment"    -> q88Sql,
    "q92_extended_funnel" -> q92Sql,
    "q96_sketch_fidelity" -> q96Sql,
    "q98_simhash_fidelity" -> q98Sql,
    "q82_source_overlap" -> q82Sql,
    "q34_content_dedup"  -> q34Sql,
    "q35_minhash_lsh"    -> q35Sql,
    "q36_simhash"        -> q36Sql,
    "q37_shingle_jaccard" -> q37Sql,
    "q45_exact_dedup"    -> q45Sql,
    "q54_edit_verify"    -> q54Sql,
    "q56_dedup_clusters" -> q56Sql,
    "q59_banded_edit"    -> q59Sql,
    "q60_dedup_decisions" -> q60Sql,
    "q69_incremental_dedup" -> q69Sql,
    "q70_dedup_report"   -> q70Sql,
    // Bloom pruning is output-invariant — q72 shares q69's oracle.
    "q72_bloom_incremental" -> q69Sql,
    "q73_decontamination" -> q73Sql,
    "q78_curation_funnel" -> q78Sql,
    "q84_source_funnel"  -> q84Sql)
}
