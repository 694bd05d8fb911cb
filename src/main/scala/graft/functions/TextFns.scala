package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by [[graft.operators.TextAnalysis]] and
  * [[graft.operators.Dedup]]: tokenization, portable word hashing, and
  * the MinHash permutation family.
  *
  * Everything here has an exact DuckDB twin (the `*Sql` builders) so the
  * dedup/similarity pipelines are oracle-checkable end-to-end. The
  * generalization of the reference's only string functions (sanitize
  * F2 + format M6, `/root/reference/java/PredictBatchMapperCluster.java:23`)
  * to a full text-pipeline toolkit is driver-mandated (BASELINE.json
  * north star).
  */
object TextFns {

  /** Whitespace tokenization; testdata is single-space separated. */
  def tokens(c: Column): Column = split(c, " ")

  def tokensSql(e: String): String = s"string_split($e, ' ')"

  /** Word-k-gram OCCURRENCES in document order, repeats included — the
    * base of the distinct near-dup features ([[shingles]], k=3), the
    * repetition gate (q80, k=3, whose whole point is counting the
    * repeats [[shingles]] drops), and the exact-substring span-dedup
    * windows (q85, k=8).
    *
    * Implementation note: built from k shifted `slice`s zipped
    * together, NOT `transform(sequence(1, n-k+1), i => element_at(t, i)…)`.
    * In the latter, every lambda element re-evaluates the embedded
    * `split` — O(tokens²) splits per document, which measured 16 s for
    * 5k docs at sf0.1 vs ~1 s for this O(tokens) form. */
  def ngramOccurrences(text: Column, k: Int): Column = {
    require(k >= 2, s"k-gram needs k >= 2, got $k")
    val t = tokens(text)
    val n = size(t)
    when(n >= k,
      transform(
        arrays_zip((0 until k).map(i => slice(t, lit(i + 1), n - (k - 1))): _*),
        s => concat_ws(" ", (0 until k).map(i => s(i.toString)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** DuckDB twin of [[ngramOccurrences]] (1-based list indexing,
    * end-exclusive `range`). */
  def ngramOccurrencesSql(e: String, k: Int): String = {
    val t = tokensSql(e)
    val parts = (0 until k).map(i => s"($t)[i+$i]").mkString(" || ' ' || ")
    s"""CASE WHEN len($t) >= $k
       |  THEN list_transform(range(1, len($t) - ${k - 2}),
       |         i -> $parts)
       |  ELSE CAST([] AS VARCHAR[]) END""".stripMargin
  }

  /** Word-3-gram occurrences — the near-dup/repetition feature base. */
  def shingleOccurrences(text: Column): Column = ngramOccurrences(text, 3)

  /** DuckDB twin of [[shingleOccurrences]]. */
  def shingleOccurrencesSql(e: String): String = ngramOccurrencesSql(e, 3)

  /** Normalized content fingerprint: md5 of the sorted-unique-token bag —
    * word-order- and repetition-insensitive, so trivially shuffled or
    * stuttered copies collapse to one key. THE exact-dedup key of the
    * whole stack (q33/q34/q45/q60, the incremental cascades, the source
    * overlap matrix, the content-stable split assignment). ONE definition:
    * a fork would silently decouple the dedup decisions from every report
    * built over them. */
  def contentFp(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** DuckDB twin of [[contentFp]]. */
  def contentFpSql(e: String): String =
    s"md5(array_to_string(list_sort(list_distinct(${tokensSql(e)})), ' '))"

  /** Distinct word-3-gram shingles (order-sensitive near-dup features).
    * Unigram features are degenerate on a small vocabulary — nearly all
    * documents share nearly all words — so every sketch (MinHash,
    * SimHash) hashes shingles instead. */
  def shingles(text: Column): Column =
    array_distinct(shingleOccurrences(text))

  /** DuckDB twin of [[shingles]]. */
  def shinglesSql(e: String): String =
    s"list_distinct(${shingleOccurrencesSql(e)})"

  // ---------------------------------------------------------------
  // MinHash family: k permutations of a 32-bit md5-derived word hash.
  //   perm_i(h) = (a_i * h + b_i) mod P
  // P is the smallest prime > 2^32; a_i odd < 2^21 keeps a*h < 2^53
  // (exact in any engine's int64). Constants are index-derived (Weyl
  // sequence), not RNG, so Spark and the SQL oracle share them.
  // ---------------------------------------------------------------
  val MinHashK = 16
  val LshBands = 4
  val LshRows  = 4 // MinHashK / LshBands
  val MinHashP = 4294967311L

  val As: IndexedSeq[Long] =
    (0 until MinHashK).map(i => 1L + 2L * ((i * 2654435761L) % 1048573L))
  val Bs: IndexedSeq[Long] =
    (0 until MinHashK).map(i => (i * 40503L + 17L) % 1048573L)

  /** Column: the i-th permuted hash of a word-hash column. */
  def perm(i: Int, h: Column): Column =
    (lit(As(i)) * h + lit(Bs(i))) % lit(MinHashP)

  /** SQL fragment mirroring [[perm]]. */
  def permSql(i: Int, h: String): String =
    s"((${As(i)} * $h + ${Bs(i)}) % $MinHashP)"

  // ---------------------------------------------------------------
  // SimHash: 32-bit sign-aggregated fingerprint over word hashes.
  // ---------------------------------------------------------------
  val SimHashBits = 32
  val SimHashBandBits = 8 // 4 bands of 8 bits: hamming<=3 => >=1 band equal

  /** Per-bit contribution of a word hash: +1 if bit j set, else -1. */
  def simBit(j: Int, h: Column): Column =
    (shiftright(h, j).bitwiseAND(lit(1L))) * lit(2L) - lit(1L)

  def simBitSql(j: Int, h: String): String =
    s"((($h >> $j) & 1) * 2 - 1)"
}
