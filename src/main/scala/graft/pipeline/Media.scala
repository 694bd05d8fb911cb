package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed multimodal pipeline: opaque binary media columns with typed
  * metadata, batched decode / feature-extract / resize / frame-sample.
  *
  * Generalizes the reference's image path → bytes → tensor chain
  * (S2+M3+M4, `/root/reference/java/PredictBatchMapperCluster.java:51-60`,
  * `python/predict_batch_threaded_local.py:78-118`) to a media-agnostic
  * `Dataset[MediaObject]` stage.
  *
  * === STUB BOUNDARY ===
  * This container ships no image/audio codecs, so [[Media.decodeStub]]
  * is a clearly-marked deterministic fake (hash-derived dimensions,
  * byte-derived features). Everything around it — the binary source, the
  * schema, the per-partition decoder init, the batch shape
  * (`grouped(batchSize)`), the failure sentinel — is the real, tested
  * Spark plumbing a production codec would drop into: replace
  * `decodeStub`/`featureStub` with the real library calls and nothing
  * else changes.
  *
  * Scale posture: content bytes stay inside one `mapPartitions` stage —
  * decode output (small typed rows + fixed-width feature vectors) is what
  * flows on; binary blobs are never shuffled. Partition sizing comes from
  * the source (`binaryFile` splits by file; parquet by row group).
  */
object Media {

  final case class MediaObject(path: String, kind: String, content: Array[Byte])

  final case class MediaMeta(path: String, kind: String, nBytes: Long,
      width: Int, height: Int, nFrames: Int, ok: Boolean)

  final case class MediaFeatures(path: String, kind: String,
      features: Array[Float])

  val FeatureDim = 16
  val DefaultBatchSize = 32

  /** Read a directory of opaque media files via Spark's `binaryFile`
    * source — the native analog of the reference's per-row HDFS fetch
    * (S2), but with split planning and predicate pushdown on metadata. */
  def binaryObjects(spark: SparkSession, path: String): Dataset[MediaObject] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .map { r =>
        val p = r.getString(0)
        MediaObject(p, kindOf(p), r.getAs[Array[Byte]](1))
      }
  }

  /** Manifest-driven S2: fetch each manifest-addressed blob lazily INSIDE
    * the task via the Hadoop `FileSystem` API — the reference's exact
    * access pattern (`fs.copyToLocalFile` per manifest row,
    * `/root/reference/java/PredictBatchMapperCluster.java:51-60`), for
    * when the manifest is a subset of the store and a directory scan
    * ([[binaryObjects]]) would read blobs nobody asked for.
    *
    * Error policy mirrors the reference: a missing/unreadable blob fails
    * the task (`copyToLocalFile` throws uncaught). `strict = false` is
    * the at-scale upgrade — skip and count, so one lost object out of a
    * billion doesn't kill the job.
    *
    * Scale posture: fetches are per-partition sequential with the
    * `FileSystem` handle cache doing connection reuse; blobs land
    * directly in task memory and are consumed by the same stage
    * ([[decodeAll]]/[[extractFeatures]]) — never shuffled. */
  def fetchByManifest(manifest: Dataset[String], strict: Boolean = true,
      missing: Option[org.apache.spark.util.LongAccumulator] = None): Dataset[MediaObject] = {
    val spark = manifest.sparkSession
    import spark.implicits._
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    manifest.mapPartitions { it =>
      val conf = confB.value.value
      it.flatMap { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        try {
          val fs = path.getFileSystem(conf) // per-scheme handle cache
          val len = fs.getFileStatus(path).getLen
          require(len <= Int.MaxValue, s"blob too large for one buffer: $p")
          val buf = new Array[Byte](len.toInt)
          val in = fs.open(path)
          try in.readFully(0, buf) finally in.close()
          Some(MediaObject(p, kindOf(p), buf))
        } catch {
          case _: java.io.IOException if !strict =>
            missing.foreach(_.add(1))
            None
        }
      }
    }
  }

  /** File-extension modality sniff (the real version adds magic bytes). */
  def kindOf(path: String): String = {
    val ext = path.substring(path.lastIndexOf('.') + 1).toLowerCase
    ext match {
      case "jpg" | "jpeg" | "png" | "bmp" | "tiff" | "webp" => "image"
      case "wav" | "mp3" | "flac" | "ogg"                   => "audio"
      case "mp4" | "mkv" | "avi" | "webm"                   => "video"
      case _                                                => "binary"
    }
  }

  // ==================================================================
  // STUB: deterministic fakes standing in for real codec calls.
  // ==================================================================

  /** STUB for `Image.open(...).size` / probe: hash-derived dimensions.
    * Deterministic and cross-run stable; throws on empty content — the
    * "undecodable media" path, handled by the sentinel in [[decodeAll]]. */
  def decodeStub(content: Array[Byte]): (Int, Int, Int) = {
    if (content.isEmpty) throw new IllegalArgumentException("empty media object")
    val d = MessageDigest.getInstance("MD5").digest(content)
    def u32(off: Int): Long =
      ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
        ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)
    val width = (u32(0) % 1920L + 1L).toInt
    val height = (u32(4) % 1080L + 1L).toInt
    val frames = (u32(8) % 240L + 1L).toInt
    (width, height, frames)
  }

  /** STUB for a feature extractor (CLIP/mel-spectrogram/…): a fixed-width
    * float vector folded from the content bytes. Real replacement returns
    * the model's embedding; shape contract (fixed [[FeatureDim]]) holds. */
  def featureStub(content: Array[Byte]): Array[Float] = {
    val acc = new Array[Float](FeatureDim)
    var i = 0
    while (i < content.length) {
      acc(i % FeatureDim) += (content(i) & 0xff) / 255.0f
      i += 1
    }
    acc
  }

  /** STUB for resize: the real version re-encodes pixels; the stub keeps
    * the contract `content → content` with a deterministic marker prefix
    * so tests can assert the batch plumbing ran. */
  def resizeStub(content: Array[Byte], w: Int, h: Int): Array[Byte] =
    s"resized:${w}x$h:".getBytes("UTF-8") ++ content

  /** Frame sampling for video-kind objects: every k-th slice of the byte
    * stream stands in for every k-th decoded frame. */
  def frameSample(content: Array[Byte], every: Int): Seq[Array[Byte]] = {
    require(every > 0)
    content.grouped(math.max(1, content.length / math.max(1, every)))
      .take(every).toSeq
  }

  // ==================================================================
  // Real Spark plumbing (tested; codec-independent).
  // ==================================================================

  /** Batched metadata decode: per-partition decoder init, `grouped`
    * batches (the production shape for a vectorized codec), per-item
    * failure → `ok=false` sentinel row with zeroed dimensions — the
    * reference's M3 error policy generalized. */
  def decodeAll(objects: Dataset[MediaObject],
      batchSize: Int = DefaultBatchSize): Dataset[MediaMeta] = {
    import objects.sparkSession.implicits._
    objects.mapPartitions { it =>
      // Per-partition decoder init happens here (codec contexts are
      // expensive; the stub needs none).
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          try {
            val (w, h, f) = decodeStub(m.content)
            val frames = if (m.kind == "video") f else 1
            MediaMeta(m.path, m.kind, m.content.length.toLong, w, h, frames,
              ok = true)
          } catch {
            case _: Exception =>
              MediaMeta(m.path, m.kind, m.content.length.toLong, 0, 0, 0,
                ok = false)
          }
        }
      }
    }
  }

  /** Batched feature extraction — same stage shape as [[decodeAll]];
    * output is the fixed-width vector column similarity search consumes
    * ([[graft.operators.Similarity]]). */
  def extractFeatures(objects: Dataset[MediaObject],
      batchSize: Int = DefaultBatchSize): Dataset[MediaFeatures] = {
    import objects.sparkSession.implicits._
    objects.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { m =>
          try Some(MediaFeatures(m.path, m.kind, featureStub(m.content)))
          catch { case _: Exception => None }
        }
      }
    }
  }
}
