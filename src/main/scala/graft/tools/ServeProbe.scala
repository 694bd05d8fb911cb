package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions.min

/** Single-request serve-latency profiler: separates the REQUEST QUERY
  * cost (plan + probe + collect) from the FULL CLI cost (arg parse,
  * output-dir checks, JSON artifact write) so request-path tuning aims
  * at the real tail. `ServeLatProbe <sf_dir> [retriever] [n]` prints one
  * JSON line with p50/min for both shapes after a warm call.
  */
object ServeProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val retriever = args.lift(1).getOrElse("fused")
    val n = args.lift(2).map(_.toInt).getOrElse(12)
    val spark = graft.GraftSession.builder(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    val id = graft.Tables.embeddings(spark, dir)
      .agg(min("vec_id")).collect().head.getLong(0)
    val tmp = Files.createTempDirectory("serve_probe_")
    val idFile = tmp.resolve("q.txt")
    Files.writeString(idFile, s"$id\n")
    require(graft.Serve.run(Array(dir, s"$tmp/warm", "--retriever",
      retriever, "--queries", idFile.toString), Some(spark)) == 0, "warm")
    def bareOnce(): Double = {
      val t0 = System.nanoTime()
      (retriever match {
        case "fused" =>
          graft.operators.Similarity.serveFusedRequest(spark, dir, Seq(id))
        case "ivf" =>
          graft.operators.Similarity.serveIvfRequest(spark, dir, Seq(id))
        case other => graft.SparkEntry.queries(
          Map("dense" -> "q38_cosine_topk", "lsh" -> "q39_lsh_ann")(other))(
          spark, dir)
      }).collect()
      (System.nanoTime() - t0) / 1e9
    }
    def fullOnce(i: Int): Double = {
      val t0 = System.nanoTime()
      require(graft.Serve.run(Array(dir, s"$tmp/r$i", "--retriever",
        retriever, "--queries", idFile.toString), Some(spark)) == 0, s"r$i")
      (System.nanoTime() - t0) / 1e9
    }
    val bare = (1 to n).map(_ => bareOnce()).sorted
    val full = (1 to n).map(fullOnce).sorted
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"metric":"serve_probe","retriever":"$retriever",""" +
      s""""n":$n,"bare_p50":${f3(bare(n / 2))},"bare_min":${f3(bare.head)},""" +
      s""""full_p50":${f3(full(n / 2))},"full_min":${f3(full.head)}}""")
    graft.operators.Features.clear(spark)
    spark.stop()
  }
}
