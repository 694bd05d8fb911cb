package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{CentroidModel, CentroidSums, LabelDict}

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
  * `--update <existing.gcm>` makes training INCREMENTAL and exact: the
  * v2 checkpoint stores the training monoid itself (per class: count +
  * exact int64 quantized sums), so folding a new labeled batch in
  * yields the byte-identical artifact a from-scratch run over the
  * union would produce — continual learning without reprocessing
  * history. The artifact pins its label names; an update against a
  * different or reordered class tree is rejected loudly (silent class
  * index remapping is the dictionary-drift failure mode), as is a v1
  * means-only artifact (its means already destroyed the monoid). An
  * update batch may legitimately carry no new images for some classes
  * — their sums pass through unchanged.
  *
  * Scale posture: the image scan is one `binaryFile` read (split-planned,
  * embarrassingly parallel decode); training is ONE
  * `groupBy(label).agg(count, 16 × sum)` whose shuffle payload after
  * map-side combine is `classes × 17` longs, and ONE bounded driver
  * collect (≤ classes rows). An update costs exactly one batch scan
  * regardless of how much history the checkpoint summarizes.
  * Undecodable training images are skipped and counted, not
  * sentinel-scored — a corrupt blob carries no label evidence.
  */
object Train {

  private val Usage =
    "Usage: graft.Train <class_dir> <model_out.gcm> " +
      "[--update <existing.gcm>] [--logit]\n" +
      "       graft.Train --eval <class_dir> <model.gcm|.glm> " +
      "<scorecard_out.tsv>"

  def main(args: Array[String]): Unit = {
    val code = run(args)
    if (code != 0) sys.exit(code)
  }

  /** Spec-friendly entry: no `System.exit`, optional injected session. */
  def run(args: Array[String], existing: Option[SparkSession] = None): Int = {
    val eIdx = args.indexOf("--eval")
    if (eIdx >= 0) return runEval(args.patch(eIdx, Nil, 1), existing)
    val lIdx = args.indexOf("--logit")
    val (logit, args1) =
      if (lIdx < 0) (false, args) else (true, args.patch(lIdx, Nil, 1))
    val uIdx = args1.indexOf("--update")
    val (updatePath, rest) =
      if (uIdx < 0) (None, args1)
      else if (uIdx + 1 >= args1.length || args1(uIdx + 1).startsWith("--"))
        (Some(""), args1) // missing value → usage error below
      else (Some(args1(uIdx + 1)), args1.patch(uIdx, Nil, 2))
    // --logit + --update is a usage error, stated rather than silent:
    // gradient descent is not a monoid — there is no exact fold of a
    // new batch into trained weights (the centroid v2 sums artifact is
    // exactly the property logit gives up for its richer boundary).
    if (logit && updatePath.isDefined) {
      System.err.println("[graft.Train] --logit cannot --update: " +
        "logistic training is not an exact monoid; retrain over the " +
        "union instead")
      return 1
    }
    if (rest.length != 2 || rest.exists(_.startsWith("--")) ||
        updatePath.contains("")) {
      System.err.println(Usage)
      return 1
    }
    val (classDir, modelOut) = (rest(0), rest(1))
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
      if (logit) {
        // The multinomial-logistic head in the same artifact contract:
        // byte-deterministic .glm with the dictionary pinned, served by
        // graft.Main --logit / LogitScorer.
        val m = pipeline.LogitModel.trainOnImages(labeled,
          Some(labels.labels), Some(skipped))
        m.save(modelOut)
        System.err.println(s"[graft.Train] trained ${m.numClasses}-class " +
          s"logit model (dim ${m.dim}, ${skipped.value} images skipped) " +
          s"-> $modelOut")
        return 0
      }
      val raw = CentroidModel.imageSums(labeled, Some(skipped))
      val sums = updatePath match {
        case Some(existingPath) =>
          val prior = CentroidSums.load(existingPath)
          require(prior.labels == labels.labels,
            s"label dictionaries differ: checkpoint has " +
              s"[${prior.labels.mkString(",")}], class tree has " +
              s"[${labels.labels.mkString(",")}] — refusing to remap " +
              "class indices silently")
          prior.merge(raw)
        case None =>
          require(raw.keySet == labels.labels.indices.toSet,
            "a class directory contributed no decodable image — every " +
              "class needs training data on a fresh train")
          CentroidSums(labels.labels, raw)
      }
      sums.save(modelOut)
      val m = sums.toModel
      System.err.println(s"[graft.Train] ${if (updatePath.isDefined) "updated"
        else "trained"} ${m.numClasses}-class centroid model " +
        s"(dim ${m.dim}, ${skipped.value} images skipped) -> $modelOut")
      0
    } catch {
      case e: Exception =>
        System.err.println(s"[graft.Train] training failed: ${e.getMessage}")
        1
    } finally if (existing.isEmpty) spark.stop()
  }

  /** `--eval`: the classifier-head SCORECARD — evaluate a trained
    * artifact (centroid `.gcm` v1/v2 or logit `.glm`, dispatched on
    * the checkpoint magic) against a labeled class tree and write the
    * per-class table `(label_idx, label_name, n_images, n_correct,
    * acc_u, conf_min_u, conf_avg_u)` as a TSV artifact — the image-head
    * twin of the oracled q209 holdout scorecard (same shape: support,
    * exact micro accuracy, worst/mean confidence per class), so the
    * centroid and logit heads are compared on the SAME corpus with the
    * SAME card. Confidence is each head's own posterior
    * (`scoreFeatures`: d₂/(d₁+d₂) for centroids, softmax for logit),
    * micro-floored.
    *
    * Scale posture: one `binaryFile` scan (decode + score per row,
    * embarrassingly parallel; the model broadcasts inside the task
    * closure), one classes-sized hash aggregate, one bounded collect
    * for the classes-sized artifact. Undecodable images are skipped
    * and counted — no label evidence, same as training. */
  private def runEval(args: Array[String],
      existing: Option[SparkSession]): Int = {
    if (args.length != 3 || args.exists(_.startsWith("--"))) {
      System.err.println(Usage)
      return 1
    }
    val (classDir, modelPath, outPath) = (args(0), args(1), args(2))
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(outPath))) {
      System.err.println(s"[graft.Train] scorecard already exists: $outPath")
      return 1
    }
    val spark = existing.getOrElse(buildSession())
    try {
      val labels = LabelDict.load(classDir)
      val magic = {
        val src = scala.io.Source.fromFile(modelPath, "UTF-8")
        try src.getLines().next().split(" ").head finally src.close()
      }
      // Dispatch on the checkpoint's own magic, and pin the dictionary:
      // an artifact whose labels disagree with the class tree would
      // produce a plausible-looking but misindexed scorecard.
      val (headName, artifactLabels, score):
          (String, Option[IndexedSeq[String]],
            Array[Float] => (Int, Double)) = magic match {
        case pipeline.LogitModel.Magic =>
          val m = pipeline.LogitModel.load(modelPath)
          ("logit", Some(m.labels), m.scoreFeatures _)
        case CentroidSums.Magic =>
          val s = CentroidSums.load(modelPath)
          val m = s.toModel
          ("centroid", Some(s.labels), m.scoreFeatures _)
        case CentroidModel.Magic =>
          val m = CentroidModel.load(modelPath)
          ("centroid", CentroidModel.labelNamesOf(modelPath),
            m.scoreFeatures _)
        case other =>
          throw new IllegalArgumentException(
            s"unrecognized model magic '$other' in $modelPath")
      }
      artifactLabels.foreach(al => require(al == labels.labels,
        s"label dictionaries differ: model has [${al.mkString(",")}], " +
          s"class tree has [${labels.labels.mkString(",")}] — refusing " +
          "a misindexed scorecard"))
      import spark.implicits._
      val dims = labels.toSeq.toDF("label_idx", "label_name")
      val skipped = spark.sparkContext.longAccumulator("eval_skipped")
      val scored = spark.read.format("binaryFile").load(s"$classDir/*/*")
        .select(col("path"), col("content"))
        .withColumn("label_name", element_at(split(col("path"), "/"), -2))
        .join(broadcast(dims), "label_name")
        .select(col("label_idx").cast("int"), col("content"))
        .as[(Int, Array[Byte])]
        .flatMap { case (idx, bytes) =>
          try {
            val (pred, prob) = score(pipeline.Media.imageFeatures(bytes))
            Some((idx, pred, math.floor(prob * 1000000.0).toLong))
          } catch {
            case _: Exception => skipped.add(1); None
          }
        }
        .toDF("label_idx", "pred", "conf_u")
      val card = scored.groupBy(col("label_idx"))
        .agg(count(lit(1)).as("n_images"),
          sum(when(col("pred") === col("label_idx"), 1L).otherwise(0L))
            .as("n_correct"),
          min(col("conf_u")).as("conf_min_u"),
          sum(col("conf_u")).as("conf_sum_u"))
        .join(broadcast(dims), "label_idx")
        .select(col("label_idx"), col("label_name"), col("n_images"),
          col("n_correct"),
          expr("(1000000 * n_correct) div n_images").as("acc_u"),
          col("conf_min_u"),
          expr("conf_sum_u div n_images").as("conf_avg_u"))
        .orderBy(col("label_idx"))
        .collect() // classes-sized
      val header = Seq("label_idx", "label_name", "n_images", "n_correct",
        "acc_u", "conf_min_u", "conf_avg_u").mkString("\t")
      val body = card.map(_.toSeq.mkString("\t")).mkString("\n")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outPath),
        s"$header\n$body\n",
        java.nio.file.StandardOpenOption.CREATE_NEW)
      val total = card.map(_.getLong(2)).sum
      val correct = card.map(_.getLong(3)).sum
      System.err.println(s"[graft.Train] $headName scorecard: " +
        s"$correct/$total correct (${skipped.value} skipped) -> $outPath")
      0
    } catch {
      case e: Exception =>
        System.err.println(s"[graft.Train] eval failed: ${e.getMessage}")
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
