package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_lm_xent(lang, tokens, lmBytes)` — per-document unigram
  * surprisal against a FROZEN language model, as one map-side codegen'd
  * expression.
  *
  * This is the scan-position form of the quality gate's xent leg
  * (`TextAnalysis.qualityDecisions`): the join form explodes every
  * token, shuffles a corpus-token-scale (lang, doc, w) frame, joins the
  * vocabulary and re-aggregates per doc — measured as the doc-side
  * wall-clock tail at the 100× sweep (q89 ×16.89, honest linear CPU
  * *plus* two corpus-token shuffles). Here the LM ships as a serialized
  * artifact inside a foldable binary literal (the `graft_bloom_contains`
  * posture — q72's corpus sketches ship the same way), deserialized
  * once per task via a codegen reference object, and each document
  * scores in one pass over its own token array: **no explode, no
  * shuffle, no join at any corpus size**.
  *
  * BIT-IDENTICAL to the join form by construction, which is what lets
  * it be the default under the same oracles: per distinct token the
  * contribution `floor(10⁶ · tf · ln(tot_s / cnt_s))` is an exact
  * int64 (same `Math.log`, same IEEE double ops, same floor), the
  * per-doc sum of int64s is order-independent, and the final
  * `floor(Σcontrib / Σtf)` is one double division — the identical
  * computation DAG the join form runs, minus the shuffle
  * (`LmScoringModeSpec` pins the equality; the driver oracle pins both
  * against DuckDB). OOV policy reproduced exactly: absent token →
  * cnt 1 (add-one maximum surprisal), absent language → the LM's
  * largest total.
  *
  * Empty token array → 0 (the join form's left-join + na.fill(0));
  * null tokens → null (the join form's explode-drops-the-doc +
  * na.fill(0) — callers coalesce to 0 the same way). Null lang is NOT
  * null-propagated: the join form's null lang matches neither the
  * vocabulary nor the per-lang totals (SQL null join keys), so the doc
  * scores every token OOV against the fallback total — this expression
  * reproduces exactly that (round-15 advice: the earlier
  * null-intolerant form coalesced such docs to xent 0, silently
  * ADMITTING the least-attested documents). A null token ELEMENT
  * likewise short-circuits to the OOV count of 1 instead of
  * string-concatenating into a lookup of the literal term "null".
  *
  * Artifact-size posture: the serialized LM is vocabulary-sized and
  * rides the expression tree as a literal reference object — a few KB
  * for the testdata LM, acceptable up to a vocabulary-head artifact of
  * tens of MB. It is NOT a torrent broadcast: past
  * [[graft.operators.Features.LmMaxBroadcastTermsConf]] terms,
  * [[graft.operators.TextAnalysis.qualityDecisions]] refuses to build
  * the artifact at all and falls back to the BIT-IDENTICAL join form
  * (logged loudly), so an oversized LM degrades to a shuffle, never to
  * a driver/plan-shipping blow-up.
  */
case class LmXentScore(lang: Expression, tokens: Expression, lm: Expression)
    extends TernaryExpression {

  override def first: Expression = lang
  override def second: Expression = tokens
  override def third: Expression = lm

  override def checkInputDataTypes(): TypeCheckResult =
    if (lang.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_lm_xent expects a string lang, got ${lang.dataType.simpleString}")
    else if (!tokens.dataType.isInstanceOf[ArrayType] ||
        tokens.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_lm_xent expects array<string> tokens, got ${tokens.dataType.simpleString}")
    else if (lm.dataType != BinaryType || !lm.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_lm_xent expects a foldable binary LM artifact literal")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType

  @transient private lazy val model: LmXent.Model =
    LmXent.deserialize(lm.eval().asInstanceOf[Array[Byte]])

  // Custom (non-nullSafe) evaluation: only a null TOKENS array
  // null-propagates; a null lang takes the join form's fallback path
  // inside [[LmXent.score]].
  override def nullable: Boolean = tokens.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val ts = tokens.eval(input)
    if (ts == null) null
    else LmXent.score(model, lang.eval(input).asInstanceOf[UTF8String],
      ts.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("lmModel", model,
      classOf[LmXent.Model].getName)
    val langGen = lang.genCode(ctx)
    val tokGen = tokens.genCode(ctx)
    val langVal = ctx.freshName("lmLang")
    ev.copy(code = code"""
      ${tokGen.code}
      boolean ${ev.isNull} = ${tokGen.isNull};
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        ${langGen.code}
        UTF8String $langVal = ${langGen.isNull} ? null : ${langGen.value};
        ${ev.value} =
          graft.functions.LmXent.score($modelRef, $langVal, ${tokGen.value});
      }""")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): LmXentScore =
    copy(lang = newFirst, tokens = newSecond, lm = newThird)
  override def prettyName: String = "graft_lm_xent"
}

object LmXent {

  /** Deserialized LM: term counts keyed lang+NUL+term (NUL cannot appear in either, so keys cannot collide), per-lang
    * totals, and the largest total as the absent-language fallback. */
  final class Model(
      val cnt: java.util.HashMap[String, java.lang.Long],
      val tot: java.util.HashMap[String, java.lang.Long],
      val fallbackTot: Long) extends Serializable

  /** Compact artifact encoding (DataOutputStream, UTF strings):
    * `nLangs (lang total)* nTerms (lang term cnt)*`. */
  def serialize(terms: Seq[(String, String, Long)],
      totals: Seq[(String, Long)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(totals.size)
    totals.foreach { case (l, t) => out.writeUTF(l); out.writeLong(t) }
    out.writeInt(terms.size)
    terms.foreach { case (l, w, c) =>
      out.writeUTF(l); out.writeUTF(w); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Model = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val tot = new java.util.HashMap[String, java.lang.Long]()
    var fallback = 1L
    val nL = in.readInt()
    var i = 0
    while (i < nL) {
      val l = in.readUTF(); val t = in.readLong()
      // The NUL lang is the null-lang sentinel: its total participates
      // in the fallback max (the join form aggregates max(total_l)
      // over ALL LM rows, null-lang rows included) but is never a
      // lookup target.
      if (l != "\u0000") tot.put(l, java.lang.Long.valueOf(t))
      if (t > fallback) fallback = t
      i += 1
    }
    val cnt = new java.util.HashMap[String, java.lang.Long]()
    val nT = in.readInt()
    i = 0
    while (i < nT) {
      val l = in.readUTF(); val w = in.readUTF(); val c = in.readLong()
      cnt.put(l + "\u0000" + w, java.lang.Long.valueOf(c))
      i += 1
    }
    new Model(cnt, tot, fallback)
  }

  /** One pass over the document's tokens: per-distinct-term tf, then
    * the exact int64 contribution sum and the single double division —
    * the join form's computation DAG verbatim. Public static-shaped so
    * generated code can call it. */
  def score(m: Model, lang: UTF8String, tokens: ArrayData): Long = {
    val n = tokens.numElements()
    if (n == 0) return 0L
    // Null lang = the join form's unmatched join keys: fallback total,
    // every token OOV (cnt 1).
    val l: String = if (lang == null) null else lang.toString
    val tf = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    var total = 0L
    while (i < n) {
      // null elements inside the array: tokens() never produces them
      // (split output), but a direct SQL caller could — skip like the
      // explode+groupBy form would (explode drops nothing, but a null
      // w joins nothing and contributes cnt_s=1 at tf of the null key;
      // the join form's groupBy treats null w as a key — match it).
      val w = tokens.getUTF8String(i)
      val key = if (w == null) null else w.toString
      val prev = tf.get(key)
      tf.put(key, java.lang.Long.valueOf(
        if (prev == null) 1L else prev.longValue() + 1L))
      total += 1L
      i += 1
    }
    val totS: Long =
      if (l == null) m.fallbackTot
      else {
        val t: java.lang.Long = m.tot.get(l)
        if (t != null && t.longValue() > 0L) t.longValue() else m.fallbackTot
      }
    var sum = 0L
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // Null lang or a null token element joins nothing in the join
      // form -> OOV count 1 (never build a lookup key that would
      // string-concat null into the literal term "null").
      val c: java.lang.Long =
        if (l == null || e.getKey == null) null
        else m.cnt.get(l + "\u0000" + e.getKey)
      val cntS: Long = if (c == null) 1L else c.longValue()
      sum += math.floor(1000000.0 * e.getValue.longValue().toDouble *
        math.log(totS.toDouble / cntS.toDouble)).toLong
    }
    math.floor(sum.toDouble / total.toDouble).toLong
  }

  /** Column API. */
  def xent(lang: Column, tokens: Column, lmBytes: Array[Byte]): Column =
    call_function("graft_lm_xent", lang, tokens, lit(lmBytes))
}
