package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType, StringType, StructField, StructType}

/** One-pass n-gram REPETITION statistics over a token array — the
  * kernel behind the Gopher-style within-document repetition rules
  * (Rae et al. 2021, "Scaling Language Models: ... Gopher", §A1.1:
  * top-n-gram character fraction for small n, duplicate-n-gram
  * character fraction for larger n, per the published corpus-filter
  * semantics).
  *
  * For the document's n-grams (tokens joined by a single space —
  * gram character length therefore includes the n−1 joining spaces,
  * matching the substring the reader sees on the page):
  *
  *   n_total     — number of n-gram occurrences, max(0, len−n+1)
  *   n_distinct  — distinct n-grams
  *   top_chars   — max over distinct grams of count·gramCharLen
  *                 (max of products: deterministic without tie-break)
  *   dup_chars   — Σ over grams with count ≥ 2 of count·gramCharLen
  *                 (the standard overlap-counting form: occurrences of
  *                 duplicated grams, chars counted per occurrence)
  *   total_chars — Σ over ALL occurrences of gramCharLen
  *
  * With n = 1 over an array of LINES the same kernel yields the
  * duplicate-line statistics (dup_line_frac from n_total−n_distinct,
  * dup_line_char_frac from dup_chars/total_chars) — one kernel for
  * the whole repetition family.
  *
  * One linear pass per document (hash map of gram → count; the map is
  * distinct-gram-sized and dies with the row — nothing is kept across
  * rows), map-side, inside whole-stage codegen via a single static
  * call (the §2.12 preference order: native Expression over UDF). A
  * null ELEMENT contributes as the empty string (split() never emits
  * SQL NULL elements; the oracle has no null path); a null ARRAY is
  * null-intolerant (UnaryExpression default) → null struct.
  */
object RepetitionKernel {
  def stats(tokens: ArrayData, n: Int): InternalRow = {
    val len = tokens.numElements()
    val nTotal = math.max(0, len - n + 1)
    if (nTotal == 0)
      return InternalRow(0L, 0L, 0L, 0L, 0L)
    val counts = new java.util.HashMap[String, Array[Long]]()
    val words = new Array[String](len)
    var i = 0
    while (i < len) {
      words(i) = if (tokens.isNullAt(i)) "" else tokens.getUTF8String(i).toString
      i += 1
    }
    val sb = new java.lang.StringBuilder
    var totalChars = 0L
    i = 0
    while (i < nTotal) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val g = sb.toString
      totalChars += g.length.toLong
      val c = counts.get(g)
      if (c == null) counts.put(g, Array(1L)) else c(0) += 1L
      i += 1
    }
    var topChars = 0L
    var dupChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      val chars = c * e.getKey.length.toLong
      if (chars > topChars) topChars = chars
      if (c >= 2L) dupChars += chars
    }
    InternalRow(nTotal.toLong, counts.size.toLong, topChars, dupChars, totalChars)
  }
}

/** struct(n_total, n_distinct, top_chars, dup_chars, total_chars) —
  * see [[RepetitionKernel]]. `n` is a construction-time constant (the
  * rule's gram size), not a child expression. */
case class RepetitionStats(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1, s"repetition_stats needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"repetition_stats expects array<string>, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_total", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_chars", LongType, nullable = false),
    StructField("dup_chars", LongType, nullable = false),
    StructField("total_chars", LongType, nullable = false)))

  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)

  override def nullSafeEval(a: Any): Any =
    RepetitionKernel.stats(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      x => s"graft.functions.RepetitionKernel.stats($x, $n)")
}

/** Word-rule counts for the Gopher battery — one pass over the token
  * array: `alpha_words` (tokens containing an ASCII letter — the
  * oracle's `[A-Za-z]` class, deliberately ASCII to keep the two
  * engines bit-equal) and `stop_hits` (DISTINCT stop-lexicon words
  * present; the token set is hashed once, then the lexicon probes it —
  * O(tokens + |lexicon|)). Why a kernel and not `filter(...)` /
  * `array_contains`: Spark's higher-order functions are
  * CodegenFallback — interpreted per row inside an otherwise codegen'd
  * stage — and the whole point of t23 is to be the cheapest possible
  * full-corpus map pass (PlanAuditSpec pins zero fallback expressions
  * on it). */
object WordRuleKernel {
  def stats(tokens: ArrayData, stopwords: Array[String]): InternalRow = {
    val len = tokens.numElements()
    var alpha = 0L
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i < len) {
      val w = if (tokens.isNullAt(i)) "" else tokens.getUTF8String(i).toString
      var hasAlpha = false
      var j = 0
      val wl = w.length
      while (j < wl && !hasAlpha) {
        val c = w.charAt(j)
        hasAlpha = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
        j += 1
      }
      if (hasAlpha) alpha += 1L
      seen.add(w)
      i += 1
    }
    var stops = 0L
    var s = 0
    while (s < stopwords.length) {
      if (seen.contains(stopwords(s))) stops += 1L
      s += 1
    }
    InternalRow(alpha, stops)
  }
}

/** struct(alpha_words, stop_hits) — see [[WordRuleKernel]]. */
case class WordRuleStats(child: Expression, stopwords: Array[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_rule_stats expects array<string>, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("alpha_words", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false)))

  override protected def withNewChildInternal(c: Expression): WordRuleStats =
    copy(child = c)

  override def nullSafeEval(a: Any): Any =
    WordRuleKernel.stats(a.asInstanceOf[ArrayData], stopwords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sw = ctx.addReferenceObj("stopwords", stopwords, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      x => s"graft.functions.WordRuleKernel.stats($x, $sw)")
  }
}

/** Line-rule counts for the Gopher battery — one pass over the line
  * array: `bullet_lines` (first char '-', '*' or '•') and
  * `ellipsis_lines` (ends with "..." or '…'). Same kernel rationale as
  * [[WordRuleKernel]]. */
object LineRuleKernel {
  def stats(lines: ArrayData): InternalRow = {
    val len = lines.numElements()
    var bullets = 0L
    var ellipses = 0L
    var i = 0
    while (i < len) {
      val l = if (lines.isNullAt(i)) "" else lines.getUTF8String(i).toString
      if (l.nonEmpty) {
        val c = l.charAt(0)
        if (c == '-' || c == '*' || c == '•') bullets += 1L
        if (l.endsWith("...") || l.charAt(l.length - 1) == '…') ellipses += 1L
      }
      i += 1
    }
    InternalRow(bullets, ellipses)
  }
}

/** struct(bullet_lines, ellipsis_lines) — see [[LineRuleKernel]]. */
case class LineRuleStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"line_rule_stats expects array<string>, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("bullet_lines", LongType, nullable = false),
    StructField("ellipsis_lines", LongType, nullable = false)))

  override protected def withNewChildInternal(c: Expression): LineRuleStats =
    copy(child = c)

  override def nullSafeEval(a: Any): Any =
    LineRuleKernel.stats(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      x => s"graft.functions.LineRuleKernel.stats($x)")
}

/** The COMPOSED Gopher battery kernel: every per-document statistic
  * the t23 rule gate needs, in one expression call — repetition stats
  * at n ∈ {2,3,4,5,10} over tokens, duplicate-line stats (n = 1 over
  * lines), word rules and line rules, each delegated to the dedicated
  * kernels above (no logic duplicated). Why composed: with eight
  * separate expression calls the fused projection's generated method
  * measured 8383 bytecodes — past HotSpot's 8000-byte JIT limit, i.e.
  * the whole stage would run in the bytecode interpreter (the r14 v2
  * cliff; spark-jit-method-budget discipline, PlanAuditSpec pins it).
  * One call + field reads keeps the stage a fraction of the budget,
  * and the row makes one pass per statistic family instead of eight
  * independent evaluations.
  */
object GopherKernel {
  /** Spark's `round(x, 6)` semantics exactly (BigDecimal HALF_UP) —
    * the rounding the engine's oracles are calibrated against. */
  private def r6(num: Long, den: Long): Double =
    if (den <= 0L) 0.0
    else java.math.BigDecimal.valueOf(num.toDouble / den.toDouble)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def stats(tokens: ArrayData, lines: ArrayData, stopwords: Array[String]): InternalRow = {
    val r2 = RepetitionKernel.stats(tokens, 2)
    val r3 = RepetitionKernel.stats(tokens, 3)
    val r4 = RepetitionKernel.stats(tokens, 4)
    val r5 = RepetitionKernel.stats(tokens, 5)
    val r10 = RepetitionKernel.stats(tokens, 10)
    val rl = RepetitionKernel.stats(lines, 1)
    val wr = WordRuleKernel.stats(tokens, stopwords)
    val lr = LineRuleKernel.stats(lines)
    val nWords = tokens.numElements().toLong
    // Σ token chars + symbol counts ('#' chars; non-overlapping '...'
    // runs — a run never spans a token boundary, so per-token counting
    // equals counting on the joined text)
    var sumWordLen = 0L
    var hashChars = 0L
    var ellipsisRuns = 0L
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      val w = if (tokens.isNullAt(i)) "" else tokens.getUTF8String(i).toString
      sumWordLen += w.length.toLong
      var j = 0
      val wl = w.length
      while (j < wl) {
        if (w.charAt(j) == '#') hashChars += 1L
        if (j + 2 < wl && w.charAt(j) == '.' && w.charAt(j + 1) == '.' && w.charAt(j + 2) == '.') {
          ellipsisRuns += 1L
          j += 2 // non-overlapping: consume the run (loop's +1 completes it)
        }
        j += 1
      }
      i += 1
    }
    // document chars of the single-space-joined text (exact identity)
    val docChars = if (nWords == 0L) 0L else sumWordLen + (nWords - 1L)
    val meanWordLen = r6(sumWordLen, nWords)
    val alphaFrac = r6(wr.getLong(0), nWords)
    val symbolRatio = r6(hashChars + ellipsisRuns, nWords)
    val top2 = r6(r2.getLong(2), docChars)
    val top3 = r6(r3.getLong(2), docChars)
    val top4 = r6(r4.getLong(2), docChars)
    val dup5 = r6(r5.getLong(3), docChars)
    val dup10 = r6(r10.getLong(3), docChars)
    val dupLine = r6(rl.getLong(0) - rl.getLong(1), rl.getLong(0))
    val dupLineChar = r6(rl.getLong(3), rl.getLong(4))
    val bulletFrac = r6(lr.getLong(0), rl.getLong(0))
    val ellipsisFrac = r6(lr.getLong(1), rl.getLong(0))
    val stopHits = wr.getLong(1)
    val passes =
      nWords >= 50L && nWords <= 100000L &&
        meanWordLen >= 3.0 && meanWordLen <= 10.0 &&
        symbolRatio <= 0.1 &&
        bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
        alphaFrac >= 0.8 && stopHits >= 2L &&
        top2 <= 0.20 && top3 <= 0.18 && top4 <= 0.16 &&
        dup5 <= 0.15 && dup10 <= 0.10 &&
        dupLine <= 0.30 && dupLineChar <= 0.20
    InternalRow(nWords, meanWordLen, stopHits, alphaFrac, symbolRatio,
      top2, top3, top4, dup5, dup10, dupLine, dupLineChar,
      bulletFrac, ellipsisFrac, passes)
  }
}

/** The finished t23 battery row — see [[GopherKernel]]. */
case class GopherStats(left: Expression, right: Expression, stopwords: Array[String])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case (a, b) => TypeCheckResult.TypeCheckFailure(s"gopher_stats expects (array<string>, array<string>), got ($a, $b)")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("mean_word_len", org.apache.spark.sql.types.DoubleType, nullable = false),
    StructField("stop_hits", LongType, nullable = false),
    StructField("alpha_word_frac", org.apache.spark.sql.types.DoubleType, nullable = false),
    StructField("symbol_ratio", org.apache.spark.sql.types.DoubleType, nullable = false),
    StructField("top2_char_frac", org.apache.spark.sql.types.DoubleType, nullable = false),
    StructField("top3_char_frac", org.apache.spark.sql.types.DoubleType, nullable = false),
    StructField("top4_char_frac", org.apache.spark.sql.types.DoubleType, nullable = false),
    StructField("dup5_char_frac", org.apache.spark.sql.types.DoubleType, nullable = false),
    StructField("dup10_char_frac", org.apache.spark.sql.types.DoubleType, nullable = false),
    StructField("dup_line_frac", org.apache.spark.sql.types.DoubleType, nullable = false),
    StructField("dup_line_char_frac", org.apache.spark.sql.types.DoubleType, nullable = false),
    StructField("bullet_line_frac", org.apache.spark.sql.types.DoubleType, nullable = false),
    StructField("ellipsis_line_frac", org.apache.spark.sql.types.DoubleType, nullable = false),
    StructField("passes_gopher", org.apache.spark.sql.types.BooleanType, nullable = false)))

  override protected def withNewChildrenInternal(l: Expression, r: Expression): GopherStats =
    copy(left = l, right = r)

  override def nullSafeEval(tokens: Any, lines: Any): Any =
    GopherKernel.stats(tokens.asInstanceOf[ArrayData], lines.asInstanceOf[ArrayData], stopwords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sw = ctx.addReferenceObj("stopwords", stopwords, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      (t, l) => s"graft.functions.GopherKernel.stats($t, $l, $sw)")
  }
}

/** Per-document statistics behind the t9 five-rule quality battery —
  * one linear pass over the token array (r21 optimization round):
  *
  *   max_count       — max multiplicity of any token (the r_top_token
  *                     numerator)
  *   stop_hits       — stop-lexicon token OCCURRENCES (t9's
  *                     `size(filter(tk, isStop))`; NOT WordRuleKernel's
  *                     distinct-word count)
  *   distinct_bigrams — distinct adjacent-token bigrams joined by a
  *                     single space (the r_repeated_bigrams numerator)
  *
  * Why a kernel: the old qualityRuleFrame computed max_count as
  * explode → groupBy(doc, tok) → groupBy(doc) max → join-back — two
  * corpus-keyed exchanges plus a broadcast join on EVERY battery call
  * (p1/p3/p4/the p5 family/p6/p7/p9/p12/x4/x5/t9 all run it), for a statistic
  * that is a per-row hash-map pass. This kernel makes the whole
  * battery a zero-shuffle scan→project pipeline (guide §2.4: remove
  * shuffles outright), and replaces the `filter`/`transform` HOFs
  * (CodegenFallback — interpreted per row) for the other two
  * statistics in the same single pass. The per-row maps are
  * distinct-token/bigram-sized and die with the row. */
object QualityRuleKernel {
  def stats(tokens: ArrayData): InternalRow = {
    val len = tokens.numElements()
    val words = new Array[String](len)
    var i = 0
    while (i < len) {
      words(i) = if (tokens.isNullAt(i)) "" else tokens.getUTF8String(i).toString
      i += 1
    }
    val counts = new java.util.HashMap[String, Array[Long]]()
    var maxC = 0L
    i = 0
    while (i < len) {
      val c = counts.get(words(i))
      val v = if (c == null) { counts.put(words(i), Array(1L)); 1L }
      else { c(0) += 1L; c(0) }
      if (v > maxC) maxC = v
      i += 1
    }
    var stops = 0L
    var s = 0
    while (s < QualityRuleKernel.stopwords.length) {
      val c = counts.get(QualityRuleKernel.stopwords(s))
      if (c != null) stops += c(0)
      s += 1
    }
    val bigrams = new java.util.HashSet[String]()
    val sb = new java.lang.StringBuilder
    i = 0
    while (i + 1 < len) {
      sb.setLength(0)
      sb.append(words(i)).append(' ').append(words(i + 1))
      bigrams.add(sb.toString)
      i += 1
    }
    InternalRow(maxC, stops, bigrams.size.toLong)
  }

  /** t9's stop lexicon — a construction-time constant of the battery
    * (kept here so the static codegen call needs no reference object). */
  private[graft] val stopwords: Array[String] =
    Array("the", "a", "and", "of", "to", "in")

  /** The five-rule keep verdict in ONE kernel call — the funnel's
    * quality gate as a row predicate (r21). The old funnel shape
    * computed keepIds = battery→filter→select(doc_id) and JOINED the
    * canonical set back on doc_id: at toy scale AQE broadcasts the id
    * set, but keepIds is corpus-sized by construction, so at 100 TB
    * that join degrades to a full corpus exchange (document bytes
    * shuffled on doc_id) for what is a per-row decision — the exact
    * shape guide §2.4 says to remove. Thresholds and arithmetic mirror
    * TextQueries' rule expressions LITERALLY (Catalyst codegen
    * evaluates the same Java double ops this method runs, so the
    * verdicts are bit-identical; QualityKeepParitySpec pins the
    * equality against the battery frame, and every funnel oracle
    * re-proves it end-to-end). Early exits short-circuit rules the
    * conjunction already decided — same boolean, and the hash-map pass
    * is skipped entirely for docs outside the word-count bounds. */
  def keep(tokens: ArrayData, nChars: Long): Boolean = {
    val nt = tokens.numElements()
    if (nt < 30 || nt > 1000) return false // r_word_count
    val ntd = nt.toDouble
    val mwl = (nChars.toDouble - (nt - 1).toDouble) / ntd
    if (!(mwl >= 3.0 && mwl <= 10.0)) return false // r_mean_word_len
    val st = stats(tokens)
    if (st.getLong(1) < 2L) return false // r_stopwords
    if (st.getLong(0).toDouble / ntd > 0.2) return false // r_top_token
    1.0 - st.getLong(2).toDouble / (nt - 1).toDouble <= 0.3 // r_repeated_bigrams
  }
}

/** struct(max_count, stop_hits, distinct_bigrams) — see
  * [[QualityRuleKernel]]. */
case class QualityRuleStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"quality_rule_stats expects array<string>, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("max_count", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false),
    StructField("distinct_bigrams", LongType, nullable = false)))

  override protected def withNewChildInternal(c: Expression): QualityRuleStats =
    copy(child = c)

  override def nullSafeEval(a: Any): Any =
    QualityRuleKernel.stats(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      x => s"graft.functions.QualityRuleKernel.stats($x)")
}

/** boolean keep verdict of the t9 battery over (tokens, n_chars) —
  * see [[QualityRuleKernel.keep]]. */
case class QualityRuleKeep(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"quality_rule_keep expects (array<string>, bigint), got ($l, $r)")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "quality_rule_keep"

  override protected def withNewChildrenInternal(l: Expression, r: Expression): QualityRuleKeep =
    copy(left = l, right = r)

  override def nullSafeEval(t: Any, n: Any): Any =
    QualityRuleKernel.keep(t.asInstanceOf[ArrayData], n.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n) => s"graft.functions.QualityRuleKernel.keep($t, $n)")
}

object RepetitionExpressions {
  private val B = org.apache.spark.sql.graft.Bridge

  /** Column wrapper: repetition statistics of gram size `n` over an
    * array<string> column. */
  def repetitionStats(tokens: Column, n: Int): Column =
    B.toColumn(RepetitionStats(B.toExpression(tokens), n))

  /** Column wrapper: struct(alpha_words, stop_hits) over tokens. */
  def wordRuleStats(tokens: Column, stopwords: Seq[String]): Column =
    B.toColumn(WordRuleStats(B.toExpression(tokens), stopwords.toArray))

  /** Column wrapper: struct(bullet_lines, ellipsis_lines) over lines. */
  def lineRuleStats(lines: Column): Column =
    B.toColumn(LineRuleStats(B.toExpression(lines)))

  /** Column wrapper: the composed t23 battery struct over
    * (tokens, lines) — see [[GopherKernel]]. */
  def gopherStats(tokens: Column, lines: Column, stopwords: Seq[String]): Column =
    B.toColumn(GopherStats(B.toExpression(tokens), B.toExpression(lines), stopwords.toArray))

  /** Column wrapper: the t9 battery statistics struct over tokens —
    * see [[QualityRuleKernel]]. */
  def qualityRuleStats(tokens: Column): Column =
    B.toColumn(QualityRuleStats(B.toExpression(tokens)))

  /** Column wrapper: the t9 battery KEEP verdict over (tokens,
    * n_chars) — see [[QualityRuleKernel.keep]]. */
  def qualityRuleKeep(tokens: Column, nChars: Column): Column =
    // long cast: a no-op on the contract's LONG n_chars, and it admits
    // integer-typed fixture frames (the expression itself is strict)
    B.toColumn(QualityRuleKeep(B.toExpression(tokens),
      B.toExpression(nChars.cast("long"))))
}
