package graft.operators

import java.nio.file.Files
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Invariant test for the q104 sliding-window chunker on documents of
  * every size class (below, at, just above, and far above the chunk
  * budget): chunks cover every token, consecutive chunks overlap by
  * exactly chunk − stride tokens, the last chunk ends at the document
  * end, and each chunk's md5 equals the hash of the hand-sliced text.
  */
class ChunkingSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val C = 32
  private val S = 24

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("coverage, overlap, terminal chunk, and content hashes hold for " +
      "every size class") {
    import spark.implicits._
    val dir = Files.createTempDirectory("chunk_").toString

    val sizes = Seq(1, 10, 31, 32, 33, 56, 57, 99, 200)
    val docs = sizes.zipWithIndex.map { case (n, i) =>
      val words = (0 until n).map(j => s"w${i}_$j")
      (i.toLong, words.mkString(" "), "en", "s0", 1L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val chunks = SparkEntry.queries("q104_chunking")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5)))
      .groupBy(_._1)

    sizes.zipWithIndex.foreach { case (n, i) =>
      val cs = chunks(i.toLong).sortBy(_._2)
      val toks = (0 until n).map(j => s"w${i}_$j")
      withClue(s"doc of $n tokens:") {
        // expected chunk count
        val expected = if (n <= C) 1 else (n - C + S - 1) / S + 1
        cs.length shouldBe expected
        // first starts at 0, last ends at n
        cs.head._3 shouldBe 0L
        cs.last._4 shouldBe n.toLong
        // stride + overlap between consecutive chunks
        cs.sliding(2).foreach {
          case Array(a, b) =>
            b._3 - a._3 shouldBe S.toLong // stride
            (a._4 - b._3) should be >= (C - S).toLong // overlap survives
          case _ =>
        }
        // spans, lengths, and content hashes
        cs.foreach { case (_, _, st, en, len, h) =>
          len shouldBe en - st
          h shouldBe md5hex(toks.slice(st.toInt, en.toInt).mkString(" "))
        }
      }
    }
  }
}
