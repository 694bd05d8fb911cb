package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{CentroidModel, LabelDict}

/** Training CLI — the entry point the reference implies but never ships
  * (its `checkpoint.pth` arrives from an offline torch run): learn the
  * [[graft.pipeline.CentroidModel]] ON the cluster from a directory of
  * labeled images and write the checkpoint artifact that
  * `graft.Main --centroid <model>` then serves.
  *
  * `<class_dir>` uses the reference's class-folder convention — one
  * subdirectory per class, images inside — which is ALSO its label
  * dictionary (`load_class_names` sorted-subdir mode,
  * `/root/reference/python/predict_batch_threaded_local.py:41-52`), so
  * the index the model learns for a class is the index
  * `graft.Main --labels <class_dir>` serves for it: train and serve can
  * never disagree on the dictionary.
  *
  * Scale posture: the image scan is one `binaryFile` read (split-planned,
  * embarrassingly parallel decode); training is ONE
  * `groupBy(label).agg(count, 16 × sum)` whose shuffle payload after
  * map-side combine is `classes × 17` longs, and ONE bounded driver
  * collect (≤ classes rows). Undecodable training images are skipped and
  * counted, not sentinel-scored — a corrupt blob carries no label
  * evidence.
  */
object Train {

  private val Usage =
    "Usage: graft.Train <class_dir> <model_out.gcm>"

  def main(args: Array[String]): Unit = {
    val code = run(args)
    if (code != 0) sys.exit(code)
  }

  /** Spec-friendly entry: no `System.exit`, optional injected session. */
  def run(args: Array[String], existing: Option[SparkSession] = None): Int = {
    if (args.length != 2 || args.exists(_.startsWith("--"))) {
      System.err.println(Usage)
      return 1
    }
    val (classDir, modelOut) = (args(0), args(1))
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(modelOut))) {
      System.err.println(s"[graft.Train] model file already exists: $modelOut")
      return 1
    }
    val spark = existing.getOrElse(buildSession())
    try {
      val labels = LabelDict.load(classDir)
      import spark.implicits._
      val dims = labels.toSeq.toDF("label_idx", "label_name")
      val labeled = spark.read.format("binaryFile").load(s"$classDir/*/*")
        .select(col("path"), col("content"))
        .withColumn("label_name", element_at(split(col("path"), "/"), -2))
        .join(broadcast(dims), "label_name")
        .select(col("label_idx"), col("content"))
      val skipped = spark.sparkContext.longAccumulator("train_skipped")
      val model = CentroidModel.trainOnImages(labeled, Some(skipped))
      require(model.numClasses == labels.size,
        s"trained ${model.numClasses} classes but dictionary has " +
          s"${labels.size} — a class directory contributed no decodable image")
      model.save(modelOut)
      System.err.println(s"[graft.Train] trained ${model.numClasses}-class " +
        s"centroid model (dim ${model.dim}, ${skipped.value} images skipped) " +
        s"-> $modelOut")
      0
    } catch {
      case e: Exception =>
        System.err.println(s"[graft.Train] training failed: ${e.getMessage}")
        1
    } finally if (existing.isEmpty) spark.stop()
  }

  private def buildSession(): SparkSession = {
    val b = SparkSession.builder()
      .appName("graft-centroid-training")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val withMaster =
      if (sys.props.contains("spark.master")) b
      else b.master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    withMaster.getOrCreate()
  }
}
