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

/** `graft_lm_xent2(lang, tokens, lm2Bytes)` — per-document BIGRAM
  * surprisal against a FROZEN bigram language model, as one map-side
  * codegen'd expression returning `struct(n_bigrams, xent2_u)`.
  *
  * The scan-position form of q141's in-corpus score, the same escape
  * [[LmXentScore]] gave the unigram gate: the join form explodes every
  * bigram occurrence, shuffles a corpus-bigram-scale frame, joins the
  * bigram-count and context-count tables and re-aggregates per doc —
  * measured ×9.85 at the 100×-doc sweep (18.0 s at 500k docs, the
  * doc-side tail). Here the two count tables ship as one serialized
  * artifact in a foldable binary literal and each document scores in a
  * single pass over its own token adjacencies: no explode, no shuffle,
  * no join at any corpus size.
  *
  * BIT-IDENTICAL to the join form: per distinct in-LM bigram the
  * contribution `floor(10⁶ · tf · ln(ctx(w₁)/cnt(w₁w₂)))` is the same
  * exact int64, the doc sum is order-independent, and `floor(Σ/Σtf)`
  * is one double division — `LmScoringModeSpec` pins the equality and
  * q141's oracle pins both against DuckDB. INNER-join semantics
  * reproduced exactly: a bigram absent from the LM (or whose w₁
  * context is absent, or a null-lang document — null keys join
  * nothing) contributes NEITHER to the sum NOR to the n_bigrams
  * denominator, and a document with no joined bigrams returns NULL
  * (the join form simply emits no row for it). Bigram construction
  * replicates `ngramOccurrences(text, 2)` — adjacent tokens joined by
  * a single space, `concat_ws` null-skipping included — and the w₁
  * context key is the text before the first space, exactly
  * `element_at(split(bg, " "), 1)`.
  *
  * Artifact-size posture: the artifact is bigram-vocabulary-sized, one
  * order bigger than the unigram LM; the SAME
  * [[graft.operators.Features.LmMaxBroadcastTermsConf]] cap guards it
  * (oversized ⇒ q141 keeps the join plan, bit-identical, loud log). A
  * production deployment that wants the map-side plan above the cap
  * ships a HEAD-capped bigram vocabulary instead — a documented
  * semantic knob (tail bigrams fall to the inner-join drop), not a
  * default.
  */
case class LmXent2Score(lang: Expression, tokens: Expression, lm: Expression)
    extends TernaryExpression {

  override def first: Expression = lang
  override def second: Expression = tokens
  override def third: Expression = lm

  override def checkInputDataTypes(): TypeCheckResult =
    if (lang.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_lm_xent2 expects a string lang, got ${lang.dataType.simpleString}")
    else if (!tokens.dataType.isInstanceOf[ArrayType] ||
        tokens.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_lm_xent2 expects array<string> tokens, got ${tokens.dataType.simpleString}")
    else if (lm.dataType != BinaryType || !lm.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_lm_xent2 expects a foldable binary LM artifact literal")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LmXent.Xent2Type
  override def nullable: Boolean = true

  @transient private lazy val model: LmXent.Model2 =
    LmXent.deserialize2(lm.eval().asInstanceOf[Array[Byte]])

  // Null lang or null tokens -> null (the join form emits no row for
  // such docs); a non-null doc whose bigrams ALL miss the LM also
  // returns null from score2 — custom eval/codegen because null can
  // arise from non-null inputs.
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = lang.eval(input)
    if (l == null) return null
    val ts = tokens.eval(input)
    if (ts == null) return null
    LmXent.score2(model, l.asInstanceOf[UTF8String], ts.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("lm2Model", model,
      classOf[LmXent.Model2].getName)
    val langGen = lang.genCode(ctx)
    val tokGen = tokens.genCode(ctx)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen
      .CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${langGen.code}
      ${tokGen.code}
      boolean ${ev.isNull} = true;
      $javaType ${ev.value} = null;
      if (!${langGen.isNull} && !${tokGen.isNull}) {
        ${ev.value} = (InternalRow) graft.functions.LmXent.score2(
          $modelRef, ${langGen.value}, ${tokGen.value});
        ${ev.isNull} = (${ev.value} == null);
      }""")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): LmXent2Score =
    copy(lang = newFirst, tokens = newSecond, lm = newThird)
  override def prettyName: String = "graft_lm_xent2"
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

  // ------------------------------------------------- bigram (xent2)

  /** Output type of [[LmXent2Score]]. */
  val Xent2Type: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_bigrams", LongType,
        nullable = false),
      org.apache.spark.sql.types.StructField("xent2_u", LongType,
        nullable = false)))

  /** Deserialized bigram LM: bigram counts keyed lang+NUL+bigram and
    * w1-context totals keyed lang+NUL+w1 (NUL appears in neither). */
  final class Model2(
      val cnt: java.util.HashMap[String, java.lang.Long],
      val ctx: java.util.HashMap[String, java.lang.Long]) extends Serializable

  /** Artifact encoding: `nCtx (lang w1 ctx)* nBigrams (lang bg cnt)*`.
    * Null-lang rows must be filtered by the caller — inner-join
    * semantics mean they can never be looked up, so they simply don't
    * ship. */
  def serialize2(bigrams: Seq[(String, String, Long)],
      contexts: Seq[(String, String, Long)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(contexts.size)
    contexts.foreach { case (l, w1, c) =>
      out.writeUTF(l); out.writeUTF(w1); out.writeLong(c)
    }
    out.writeInt(bigrams.size)
    bigrams.foreach { case (l, bg, c) =>
      out.writeUTF(l); out.writeUTF(bg); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize2(bytes: Array[Byte]): Model2 = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val ctx = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    val nC = in.readInt()
    while (i < nC) {
      val l = in.readUTF(); val w1 = in.readUTF(); val c = in.readLong()
      ctx.put(l + "\u0000" + w1, java.lang.Long.valueOf(c))
      i += 1
    }
    val cnt = new java.util.HashMap[String, java.lang.Long]()
    val nB = in.readInt()
    i = 0
    while (i < nB) {
      val l = in.readUTF(); val bg = in.readUTF(); val c = in.readLong()
      cnt.put(l + "\u0000" + bg, java.lang.Long.valueOf(c))
      i += 1
    }
    new Model2(cnt, ctx)
  }

  /** One pass over the document's token adjacencies — the q141 join
    * pipeline's computation DAG verbatim (see [[LmXent2Score]] for the
    * inner-join and bigram-construction contracts). Returns null when
    * no bigram joins (the join form emits no row for the doc). */
  def score2(m: Model2, lang: UTF8String,
      tokens: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = tokens.numElements()
    if (n < 2) return null
    val l = lang.toString
    val tf = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    while (i < n - 1) {
      val w1 = tokens.getUTF8String(i)
      val w2 = tokens.getUTF8String(i + 1)
      // concat_ws(" ", w1, w2): null elements are SKIPPED (no
      // separator emitted for them).
      val bg =
        if (w1 == null) { if (w2 == null) "" else w2.toString }
        else if (w2 == null) w1.toString
        else w1.toString + " " + w2.toString
      val prev = tf.get(bg)
      tf.put(bg, java.lang.Long.valueOf(
        if (prev == null) 1L else prev.longValue() + 1L))
      i += 1
    }
    var sumU = 0L
    var nBigrams = 0L
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bg = e.getKey
      val c: java.lang.Long = m.cnt.get(l + "\u0000" + bg)
      if (c != null) {
        // w1 = element_at(split(bg, " "), 1): the text before the
        // first space (the whole string when spaceless).
        val sp = bg.indexOf(' ')
        val w1 = if (sp < 0) bg else bg.substring(0, sp)
        val x: java.lang.Long = m.ctx.get(l + "\u0000" + w1)
        if (x != null) {
          val t = e.getValue.longValue()
          sumU += math.floor(1000000.0 * t.toDouble *
            math.log(x.longValue().toDouble / c.longValue().toDouble)).toLong
          nBigrams += t
        }
      }
    }
    if (nBigrams == 0L) return null
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nBigrams,
        math.floor(sumU.toDouble / nBigrams.toDouble).toLong))
  }

  /** Column API. */
  def xent2(lang: Column, tokens: Column, lm2Bytes: Array[Byte]): Column =
    call_function("graft_lm_xent2", lang, tokens, lit(lm2Bytes))
}
