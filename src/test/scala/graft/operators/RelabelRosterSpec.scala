package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q172: the uncertainty-sampling relabel roster. On the mixed fixture
  * the knife-edge labels' rosters must be exactly their three lowest
  * vec_ids at margin 0 (ties break on id); rosters never exceed K per
  * label, are rank-ordered by ascending margin, and the clean label's
  * roster carries strictly positive margins. */
class RelabelRosterSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = Similarity.Dim

  private def vec(cluster: Int, jitter: Int): Array[Float] =
    (0 until Dim).map { d =>
      val base = if (d / 6 == cluster) 1.0f else 0.02f
      base + (((jitter * 7 + d * 3) % 5) - 2) * 0.01f
    }.toArray

  test("knife-edge labels roster their lowest ids at margin 0; ranks " +
      "ascend by margin; at most K rows per label") {
    import spark.implicits._
    val dir = Files.createTempDirectory("roster_").toString
    ((0 until 10).map(i => (i.toLong, vec(0, i), 0)) ++
      (0 until 10).map(i => ((100 + i).toLong, vec(1, i), 1)) ++
      (0 until 10).map(i => ((200 + i).toLong, vec(1, i), 2)))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val rows = SparkEntry.queries("q172_relabel_roster")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))

    val byLabel = rows.groupBy(_._1)
    byLabel.keySet shouldBe Set(0, 1, 2)
    all(byLabel.values.map(_.length)) shouldBe Similarity.RosterK

    // knife-edge labels: margin exactly 0, lowest ids first
    byLabel(1).sortBy(_._2).map(r => (r._3, r._4)) shouldBe
      Seq((100L, 0L), (101L, 0L), (102L, 0L))
    byLabel(2).sortBy(_._2).map(r => (r._3, r._4)) shouldBe
      Seq((200L, 0L), (201L, 0L), (202L, 0L))

    // the clean label's hardest examples still carry real margins,
    // ranked ascending
    val clean = byLabel(0).sortBy(_._2)
    all(clean.map(_._4)) should be > 0L
    clean.map(_._4) shouldBe clean.map(_._4).sorted
  }
}
