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

  final case class MediaRow(path: String, kind: String, content: Array[Byte])

  /** Spectrally dense grayscale scene (PhashSpec's fixture recipe): a
    * sum of 2D cosines with seed-dependent signs, so every retained
    * pHash DCT coefficient is significantly nonzero — the property of
    * natural images that keeps the hash stable under re-encode/resize.
    * Pure function of (seed, w, h): regeneration is byte-identical. */
  private def sceneBytes(seed: Long, w: Int, h: Int,
      fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    // md5-derived signs, NOT java.util.Random(sequential seed): an
    // LCG's first draw is correlated across adjacent seeds, which made
    // distinct scenes share sign patterns (hamming collapse → a
    // quadratic pair explosion in the first cut of this generator).
    val sign = Array.tabulate(8, 8) { (u, v) =>
      if (graft.pipeline.HashScorer.md5u32(s"$seed:$u:$v") % 2 == 0) 1.0
      else -1.0
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            if (u + v > 0)
              s += sign(u)(v) * 60.0 / (1.0 + u + v) *
                math.cos(math.Pi * u * (y + 0.5) / h) *
                math.cos(math.Pi * v * (x + 0.5) / w)
            v += 1
          }
          u += 1
        }
        val c = (128 + s).toInt.max(0).min(255)
        img.setRGB(x, y, (c << 16) | (c << 8) | c)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  /** ~10% planted image near-dups: id % 10 == 1 re-renders the
    * PREVIOUS id's scene at a different resolution and format — the
    * re-encode+resize class pHash exists to catch (byte fingerprints
    * structurally miss it). */
  private def imageRow(id: Long): MediaRow = {
    val bytes =
      if (id % 10 == 1 && id > 0) sceneBytes(id - 1, 48, 36, "jpg")
      else sceneBytes(id, 64, 48, "png")
    MediaRow(f"img$id%08d", "image", bytes)
  }

  /** Seeded PCM clip with an md5-derived 65-step amplitude ENVELOPE —
    * the fingerprint reads consecutive-segment RMS comparisons, so the
    * envelope steps must be seed-unique per segment or distinct clips
    * share bits (a small sine-frequency domain collides wholesale).
    * `gainPct` scales every sample (the re-mastering class the
    * gain-invariant fingerprint catches). */
  private def clipSamples(seed: Long, gainPct: Int): Array[Short] = {
    val segs = 65
    val env = Array.tabulate(segs)(b =>
      0.2 + 0.8 * (graft.pipeline.HashScorer.md5u32(s"$seed:$b") % 1000) / 1000.0)
    val n = 4000
    Array.tabulate(n) { i =>
      val t = i.toDouble / n
      val a = env((i.toLong * segs / n).toInt)
      val v = a * math.sin(2 * math.Pi * 40 * t)
      (v * 12000 * gainPct / 100).toShort
    }
  }

  /** 16-bit mono PCM WAV encoded by AudioSystem (a real RIFF header,
    * the same encoder MediaSpec's fixtures use). */
  private def wavBytes(samples: Array[Short]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** ~10% planted audio near-dups: id % 10 == 1 is the PREVIOUS id's
    * clip re-gained to 40% — Hamming 0 under the gain-invariant
    * fingerprint, invisible to byte hashes. */
  private def audioRow(id: Long): MediaRow = {
    val bytes =
      if (id % 10 == 1 && id > 0) wavBytes(clipSamples(id - 1, 40))
      else wavBytes(clipSamples(id, 100))
    MediaRow(f"clip$id%08d", "audio", bytes)
  }

  /** Generate decodable media at scale: `images.parquet` +
    * `audio.parquet` under `dir`, (path, kind, content) rows with REAL
    * PNG/JPEG/WAV bytes and ~10% planted perceptual near-dups each —
    * the multimodal twin of [[generate]]'s planted text duplicates,
    * sized for the ScaleBench `media` phase. Embarrassingly parallel
    * (pure function of id), deterministic across regenerations. */
  def generateMedia(spark: SparkSession, dir: String, nImages: Long,
      nAudio: Long): Unit = {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    spark.range(0, nImages, 1, par).as[Long].map(imageRow _)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/images.parquet")
    spark.range(0, nAudio, 1, par).as[Long].map(audioRow _)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/audio.parquet")
  }

  /** A labeled training scene for the ScaleBench `train` phase: class =
    * `id % 10`, rendered as a low-amplitude texture around a per-class
    * luminance center (the 10 bands stay separable in the 16-bin
    * histogram space [[graft.pipeline.CentroidModel]] trains over).
    * Pure function of id — deterministic, embarrassingly parallel. */
  private def labeledRow(id: Long): (Int, Array[Byte]) = {
    val cls = (id % 10).toInt
    val center = 18 + 24 * cls
    val w = 32
    val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val sign = Array.tabulate(4, 4) { (u, v) =>
      if (graft.pipeline.HashScorer.md5u32(s"train:$id:$u:$v") % 2 == 0) 1.0
      else -1.0
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var s = 0.0
        var u = 0
        while (u < 4) {
          var v = 0
          while (v < 4) {
            if (u + v > 0)
              s += sign(u)(v) * 8.0 / (1.0 + u + v) *
                math.cos(math.Pi * u * (y + 0.5) / h) *
                math.cos(math.Pi * v * (x + 0.5) / w)
            v += 1
          }
          u += 1
        }
        val c = (center + s).toInt.max(0).min(255)
        img.setRGB(x, y, (c << 16) | (c << 8) | c)
        x += 1
      }
      y += 1
    }
    val outBuf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", outBuf)
    (cls, outBuf.toByteArray)
  }

  /** Labeled image corpus for the centroid-training scale phase:
    * `(label_idx, content)` parquet, 10 luminance classes. */
  def generateLabeledImages(spark: SparkSession, dir: String,
      n: Long): Unit = {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, par).as[Long].map(labeledRow _)
      .toDF("label_idx", "content")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/labeled.parquet")
  }

  /** Skewed documents table: `nBase` distinct docs plus `hotCopies` EXACT
    * copies of one viral document (ids from 10_000_000) — every copy
    * lands in the same four LSH band buckets, concentrating
    * m(m-1)/2 candidate pairs on single join keys unless salted. */
  final case class EventGenRow(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double, props: String)

  private val EventTypes =
    Vector("view", "click", "purchase", "signup", "error")
  private val EventEpochMicros =
    java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond * 1000000L
  private val EventSpanMicros = 30L * 24 * 3600 * 1000000L

  /** Testdata-shaped event row: same schema, type set, 30-day January
    * window, and value range as the driver's events.parquet tables;
    * timestamps increase with event_id (an append log) with per-slot
    * jitter, exactly like the driver tables. Pure function of
    * (id, nEvents, nUsers) — regeneration is byte-identical. */
  private def eventRow(id: Long, nEvents: Long, nUsers: Long): EventGenRow = {
    val r = new java.util.Random(id * 6364136223846793005L + 97L)
    val slot = math.max(1L, EventSpanMicros / nEvents)
    val tsMicros = EventEpochMicros + id * slot +
      math.floorMod(r.nextLong(), slot)
    val ts = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      tsMicros / 1000000L, (tsMicros % 1000000L) * 1000L))
    EventGenRow(id, ts, r.nextInt(nUsers.toInt).toLong,
      EventTypes(r.nextInt(EventTypes.size)),
      math.rint(r.nextDouble() * 560.0 * 100.0) / 100.0,
      s"""{"k": ${r.nextInt(100)}}""")
  }

  /** Generate `events.parquet` under `dir` — the scale axis for the
    * session/event analytics family (the driver generator caps at
    * sf0.1 = 100k events / 1.5k users; this produces the 100× corpus
    * the round-12 verdict asked the family to be swept on). */
  def generateEvents(spark: SparkSession, dir: String, nEvents: Long,
      nUsers: Long): Unit = {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    spark.range(0, nEvents, 1, par).as[Long]
      .map(id => eventRow(id, nEvents, nUsers))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
  }

  // ------------------------------------------------------------------
  // TPC-H-ish relational generator: the 100× scale axis for the
  // relational prefix (q01–q19, q47–q49, q134). Same schemas, key
  // relationships, and value DOMAINS as the driver testdata (so every
  // filter/band predicate selects non-trivially); distributions are
  // uniform — the sweep measures plan scaling, not cardinality
  // estimation. Deterministic per id.
  // ------------------------------------------------------------------
  final case class CustRow(c_custkey: Long, c_name: String,
      c_nationkey: Int, c_acctbal: Double, c_mktsegment: String)
  final case class SuppRow(s_suppkey: Long, s_name: String,
      s_nationkey: Int, s_acctbal: Double)
  final case class PartRow(p_partkey: Long, p_name: String,
      p_brand: String, p_type: String, p_size: Int, p_retailprice: Double)
  final case class OrderRow(o_orderkey: Long, o_custkey: Long,
      o_orderstatus: String, o_totalprice: Double,
      o_orderdate: java.sql.Timestamp, o_orderpriority: String)
  final case class LineRow(l_orderkey: Long, l_partkey: Long,
      l_suppkey: Long, l_linenumber: Int, l_quantity: Double,
      l_extendedprice: Double, l_discount: Double, l_tax: Double,
      l_returnflag: String, l_linestatus: String,
      l_shipdate: java.sql.Timestamp)

  private val Segments = Vector("AUTOMOBILE", "BUILDING", "FURNITURE",
    "HOUSEHOLD", "MACHINERY")
  private val Priorities = Vector("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")
  private val PTypes =
    Vector("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
  private val PColors = Vector("cold", "hot", "blue", "red", "small", "old",
    "large", "new")
  private val PNouns = Vector("plate", "gear", "rod", "ring", "bolt", "anvil")
  private val RfLs = Vector(("A", "F"), ("A", "O"), ("N", "F"), ("N", "O"),
    ("R", "F"), ("R", "O"))
  private val Epoch1995 = 788918400L // 1995-01-01T00:00:00Z, seconds

  private def money(r: java.util.Random, lo: Double, hi: Double): Double =
    math.rint((lo + r.nextDouble() * (hi - lo)) * 100.0) / 100.0
  private def dayTs(r: java.util.Random, spanDays: Int): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Epoch1995 + r.nextInt(spanDays).toLong * 86400L))

  /** Generate the seven relational tables under `dir`, scaled from the
    * driver sf0.1 cardinalities by `factor` (100 → customer 1.5M,
    * orders 15M, lineitem 60M — exactly 4 lines per order, FK-valid
    * by construction).
    *
    * `hotCustomerShare` > 0 PLANTS customer-key skew (round-14 verdict
    * task 7's harness): that share of all orders is owned by customer
    * 0, so every orders⋈customer shuffle join (q05's first hop, q232's
    * returned-revenue hop) concentrates half its rows on ONE shuffle
    * key once the customer side outgrows broadcast — the shape AQE's
    * OptimizeSkewedJoin exists for, measured by the `relskew` phase. */
  def generateRelational(spark: SparkSession, dir: String,
      factor: Long, hotCustomerShare: Double = 0.0): Unit = {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val (nCust, nSupp, nPart, nOrd) =
      (15000L * factor, 1000L * factor, 20000L * factor, 150000L * factor)
    Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
      (4, "MIDDLE EAST")).toDF("r_regionkey", "r_name")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/region.parquet")
    (0 until 25).map(i => (i, s"NATION_$i", i % 5))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/nation.parquet")
    spark.range(0, nCust, 1, par).as[Long].map { id =>
      val r = new java.util.Random(id * 7919L + 1)
      CustRow(id, f"Customer#$id%09d", r.nextInt(25),
        money(r, -999.85, 9999.8), Segments(r.nextInt(5)))
    }.write.mode(SaveMode.Overwrite).parquet(s"$dir/customer.parquet")
    spark.range(0, nSupp, 1, par).as[Long].map { id =>
      val r = new java.util.Random(id * 6131L + 2)
      SuppRow(id, f"Supplier#$id%09d", r.nextInt(25),
        money(r, -999.0, 9999.0))
    }.write.mode(SaveMode.Overwrite).parquet(s"$dir/supplier.parquet")
    spark.range(0, nPart, 1, par).as[Long].map { id =>
      val r = new java.util.Random(id * 4253L + 3)
      PartRow(id, s"${PColors(r.nextInt(PColors.size))} " +
          s"${PNouns(r.nextInt(PNouns.size))}",
        s"Brand#${r.nextInt(25) + 1}", PTypes(r.nextInt(PTypes.size)),
        r.nextInt(50) + 1, money(r, 900.0, 999.9))
    }.write.mode(SaveMode.Overwrite).parquet(s"$dir/part.parquet")
    val hotShare = hotCustomerShare
    spark.range(0, nOrd, 1, par).as[Long].map { id =>
      val r = new java.util.Random(id * 104729L + 4)
      val cust =
        if (hotShare > 0 && r.nextDouble() < hotShare) 0L
        else r.nextInt(nCust.toInt).toLong
      OrderRow(id, cust,
        Vector("O", "P", "F")(r.nextInt(3)), money(r, 1000.0, 500000.0),
        dayTs(r, 2405), Priorities(r.nextInt(5)))
    }.write.mode(SaveMode.Overwrite).parquet(s"$dir/orders.parquet")
    spark.range(0, nOrd * 4, 1, par).as[Long].map { id =>
      val r = new java.util.Random(id * 15485863L + 5)
      val (rf, ls) = RfLs(r.nextInt(RfLs.size))
      LineRow(id / 4, r.nextInt(nPart.toInt).toLong,
        r.nextInt(nSupp.toInt).toLong, (id % 4).toInt + 1,
        (r.nextInt(50) + 1).toDouble, money(r, 900.68, 104999.91),
        r.nextInt(11) / 100.0, r.nextInt(9) / 100.0, rf, ls,
        dayTs(r, 2500))
    }.write.mode(SaveMode.Overwrite).parquet(s"$dir/lineitem.parquet")
  }

  /** Re-lay the generated fact tables in the WAREHOUSE layout: orders
    * date-partitioned by `o_date` (one directory per order day),
    * events by `day`, documents by `source` — the Hive-style layout a
    * 100 TB deployment stores facts in, where a date/source-bounded
    * read prunes at the FILE LISTING ([[graft.Tables.ordersDated]] /
    * [[graft.Tables.eventsDated]] pick these up automatically when the
    * `_part` directories exist). Each table is repartitioned BY its
    * partition key before the write so every day/source lands as one
    * file per directory, not one per (task × key) — 2405 order days ×
    * 32 tasks would otherwise write ~77k splinter files. */
  def generatePartitioned(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions.{col, expr}
    // Tolerate partial dirs: the 100× harnesses carry only their own
    // family's tables (rel100 has no events; ev100 has no orders).
    def has(name: String): Boolean =
      java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/$name.parquet"))
    // Orders partition at MONTH granularity, not day: the 100× harness
    // carries ~6k orders/day, and daily directories (2405 of them)
    // MEASURED SLOWER than the flat scan (0.47× — the small-files
    // listing/footer tax beat the pruning); ~80 month directories at
    // ~190k rows each price the same year-bounded pruning without the
    // tax. Partition granularity must match per-partition volume —
    // that measurement is the point of the `partition` phase.
    if (has("orders"))
      spark.read.parquet(s"$dir/orders.parquet")
        .withColumn("o_month",
          expr("CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS DATE)"))
        .repartition(col("o_month"))
        .write.mode(SaveMode.Overwrite).partitionBy("o_month")
        .parquet(s"$dir/orders_part")
    if (has("events"))
      graft.Tables.events(spark, dir)
        .withColumn("day", expr("CAST(ts AS DATE)"))
        .repartition(col("day"))
        .write.mode(SaveMode.Overwrite).partitionBy("day")
        .parquet(s"$dir/events_part")
    // Documents: N files per source directory, not one. The corpus has
    // only a handful of sources, so repartition(source) alone produced
    // one giant file per dir and the partitioned read lost the flat
    // layout's intra-table parallelism (measured: q250's drill leg at
    // 0.87× of flat, round-15 BENCH_NOTES). Shuffling on (source,
    // hash(doc_id) % N) splits each source across N writer tasks —
    // every directory gets N similar-sized files, and the read side
    // parallelizes per source with pruning unchanged.
    if (has("documents"))
      spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("_fsplit",
          org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.hash(col("doc_id")),
            org.apache.spark.sql.functions.lit(DocFilesPerSource)))
        .repartition(col("source"), col("_fsplit"))
        .drop("_fsplit")
        .write.mode(SaveMode.Overwrite).partitionBy("source")
        .parquet(s"$dir/documents_part")
  }

  /** Files per source directory in the partitioned documents layout —
    * enough that a few-source corpus still reads with task parallelism
    * (32 local cores / ~4 sources ≈ 8 splits each). */
  val DocFilesPerSource = 8

  /** Temp ALIAS of `srcDir` carrying both layouts: flat tables as
    * symlinks plus the `_part` warehouse layouts from
    * [[generatePartitioned]] — the fixture PlanShapeSpec pins and
    * `graft.Explain` renders the partitioned plan variants from. */
  def partitionedAlias(spark: SparkSession, srcDir: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_part_")
    new java.io.File(srcDir).listFiles().foreach { f =>
      java.nio.file.Files.createSymbolicLink(d.resolve(f.getName), f.toPath)
    }
    generatePartitioned(spark, d.toString)
    d.toString
  }

  /** 100×-factor relational harness with a VIRAL ORDER: the standard
    * [[generateRelational]] tables plus `hotLines` extra lineitem rows
    * ALL on `l_orderkey = 0` — a flash-sale/bot order with millions of
    * lines. Unlike the customer-side skew (which broadcast structurally
    * absorbs while the dimension fits), this plants the hot key in the
    * orders⋈lineitem ORDERKEY join, where BOTH sides are facts and
    * neither can ever broadcast — the genuinely warehouse-shaped skew
    * case AQE's OptimizeSkewedJoin exists for (ScaleBench phase
    * `factskew` measures the split on/off and pins `skew=true`). */
  def generateFactSkew(spark: SparkSession, dir: String, factor: Long,
      hotLines: Long): Unit = {
    import spark.implicits._
    generateRelational(spark, dir, factor)
    val par = spark.sparkContext.defaultParallelism
    val nPart = 20000L * factor
    val nSupp = 1000L * factor
    // 64-bit-safe key draw: nextInt(n.toInt) overflows (throws or goes
    // negative) once factor > ~107k pushes nPart past Int.MaxValue.
    // Keep the Int path when it fits so existing factors regenerate
    // byte-identically; floorMod(nextLong, n) above it.
    def drawKey(r: java.util.Random, n: Long): Long =
      if (n <= Int.MaxValue) r.nextInt(n.toInt).toLong
      else Math.floorMod(r.nextLong(), n)
    spark.range(0, hotLines, 1, par).as[Long].map { i =>
      val r = new java.util.Random(i * 48271L + 11)
      val (rf, ls) = RfLs(r.nextInt(RfLs.size))
      LineRow(0L, drawKey(r, nPart),
        drawKey(r, nSupp), (i % 7).toInt + 1,
        (r.nextInt(50) + 1).toDouble, money(r, 900.68, 104999.91),
        r.nextInt(11) / 100.0, r.nextInt(9) / 100.0, rf, ls,
        dayTs(r, 2500))
    }.write.mode(SaveMode.Append).parquet(s"$dir/lineitem.parquet")
  }

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
