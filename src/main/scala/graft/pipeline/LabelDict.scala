package graft.pipeline

import java.io.File

/** M1: the label dictionary, with the reference's exact load precedence
  * (`/root/reference/python/predict_batch_threaded_local.py:41-52`):
  *
  *  1. a regular file → its non-empty trimmed lines, in file order;
  *  2. a directory with subdirectories → **sorted** subdirectory names;
  *  3. a directory with only files → sorted file stems (name minus the
  *     last extension).
  *
  * Lookup uses the reference's out-of-range policy: any index outside
  * `[0, size)` falls back to `labels(0)`
  * (`/root/reference/python/predict_batch_threaded_local.py:159`).
  *
  * Scale note: a label dictionary is O(classes) — broadcast it
  * (`spark.sparkContext.broadcast(dict)`) rather than shipping per-task
  * closures; for join-shaped analytics materialize via [[toSeq]] into a
  * small dim DataFrame.
  */
final case class LabelDict(labels: IndexedSeq[String]) extends Serializable {
  require(labels.nonEmpty, "label dictionary must not be empty")

  def apply(idx: Int): String =
    if (idx >= 0 && idx < labels.size) labels(idx) else labels(0)

  def size: Int = labels.size
  def toSeq: Seq[(Int, String)] = labels.zipWithIndex.map(_.swap)
}

object LabelDict {

  def load(path: String): LabelDict = {
    val f = new File(path)
    require(f.exists, s"label source not found: $path")
    if (f.isFile) fromLines(scala.io.Source.fromFile(f, "UTF-8"))
    else {
      val entries = Option(f.listFiles).getOrElse(Array.empty)
      val dirs = entries.filter(_.isDirectory).map(_.getName)
      if (dirs.nonEmpty) LabelDict(dirs.sorted.toIndexedSeq)
      else {
        val stems = entries.filter(_.isFile).map { e =>
          val n = e.getName
          val dot = n.lastIndexOf('.')
          if (dot > 0) n.substring(0, dot) else n
        }
        LabelDict(stems.distinct.sorted.toIndexedSeq)
      }
    }
  }

  private def fromLines(src: scala.io.Source): LabelDict =
    try LabelDict(src.getLines().map(_.trim).filter(_.nonEmpty).toIndexedSeq)
    finally src.close()
}
