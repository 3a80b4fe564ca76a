package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}

/** Greedy longest-match subword ENCODER against a frozen stored vocab —
  * the engine's BPE-style tokenizer kernel (SURVEY.md §2.12 preference
  * order: native codegen'd Expression over UDF). One pass over a
  * document's whitespace-token array: each word is consumed left to
  * right, at every position taking the LONGEST vocab piece (4, 3, then
  * 2 chars) that prefixes the remainder, else one character — exactly
  * the closed form the t19 DuckDB oracle states as a recursive CTE.
  *
  * Returns struct(n_tokens_bpe, bpe_digest): the subword token count a
  * trainer would bill, and a position-keyed digest of the full piece
  * sequence — per word w (1-based), dig_w = fold over its pieces of
  * (acc·31 + len(piece) + code(piece[0])) mod 1e9+7, summed per doc as
  * Σ (w·1000003 + dig_w). The digest is exact integer arithmetic in
  * both engines: `code` is the Unicode CODE POINT of the piece's first
  * character (`codePointAt`, matching DuckDB ascii()), not a UTF-16
  * code unit, so the two engines agree beyond ASCII and surrogate
  * pairs don't make the digest code-unit-dependent. Piece BOUNDARIES
  * are still char-indexed (vocab pieces are 2..4 UTF-16 units), so a
  * vocab fit over non-BMP text can split a surrogate pair into
  * lone-surrogate pieces — fine for counting/digesting, but callers
  * feeding non-BMP corpora should treat piece strings as opaque. Any
  * mis-encoded piece anywhere in the doc moves the oracle hash.
  *
  * The vocab is a driver-frozen Array[String] (the PQ-codebook
  * discipline: fit once per corpus snapshot, stored, injected as a
  * reference object); per-length hash sets are built lazily once per
  * executor JVM, and codegen emits a single matcher call so the row
  * stays inside whole-stage codegen.
  */
final class BpeMatcher(val vocab: Array[String]) extends Serializable {
  require(vocab.forall(p => p.length >= 2 && p.length <= 4),
    "vocab pieces must be 2..4 chars (1-char fallback is implicit)")

  // sets(l-2) holds the length-l pieces; lazy so the driver-serialized
  // matcher rebuilds them once per executor JVM
  @transient private lazy val sets: Array[java.util.HashSet[String]] = {
    val s = Array.fill(3)(new java.util.HashSet[String]())
    vocab.foreach(p => s(p.length - 2).add(p))
    s
  }

  /** The per-doc one-pass encode (see class doc). Called from both
    * interpreted eval and generated code. */
  def stats(tokens: ArrayData): InternalRow = {
    val byLen = sets
    var nPieces = 0L
    var acc = 0L
    val n = tokens.numElements()
    var wi = 0
    while (wi < n) {
      // a null token encodes like the empty word: zero pieces (matches
      // the oracle, whose split() never produces SQL NULL elements)
      val w = if (tokens.isNullAt(wi)) "" else tokens.getUTF8String(wi).toString
      var dig = 0L
      val len = w.length
      var i = 0
      while (i < len) {
        val maxL = math.min(4, len - i)
        var take = 1
        var l = maxL
        while (l >= 2 && take == 1) {
          if (byLen(l - 2).contains(w.substring(i, i + l))) take = l
          l -= 1
        }
        dig = (dig * 31L + take.toLong + w.codePointAt(i).toLong) % 1000000007L
        nPieces += 1L
        i += take
      }
      acc += (wi + 1).toLong * 1000003L + dig
      wi += 1
    }
    InternalRow(nPieces, acc)
  }
}

/** struct(n_tokens_bpe, bpe_digest) over an array<string> token column
  * — see [[BpeMatcher]]. */
case class BpeStats(child: Expression, matcher: BpeMatcher)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_stats expects array<string>, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens_bpe", LongType, nullable = false),
    StructField("bpe_digest", LongType, nullable = false)))

  override protected def withNewChildInternal(c: Expression): BpeStats =
    copy(child = c)

  override def nullSafeEval(a: Any): Any =
    matcher.stats(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeMatcher", matcher, classOf[BpeMatcher].getName)
    defineCodeGen(ctx, ev, x => s"$m.stats($x)")
  }
}

/** Rank-ordered BPE MERGE table — the semantics real tokenizers bill
  * in (GPT-2-style byte-pair encoding): a frozen list of (left, right)
  * token pairs in priority order; a word encodes by starting from its
  * characters and repeatedly merging the adjacent pair with the LOWEST
  * rank (leftmost occurrence on ties) until no adjacent pair is in the
  * table. Greedy longest-match (BpeMatcher) diverges from this exactly
  * on boundary-ambiguous strings — e.g. with pieces {ab, bc}, greedy
  * segments "abc" as [ab, c] while a merge table ranking (b,c) first
  * yields [a, bc] — so a trainer billing merge-order tokens needs this
  * encoder, not the greedy approximation (SubwordSpec pins divergence
  * cases; SCALE.md documents the measured corpus-level divergence).
  *
  * Pairs are keyed left + U+0001 + right (the separator never occurs
  * in corpus text), so (a,bc) and (ab,c) are DISTINCT rules — matching
  * the oracle's chr(1)-joined pair list. Rank lookup is a hash map
  * built lazily once per executor JVM; rank VALUES are the dense
  * array positions (ties impossible: pairs are distinct), identical to
  * the oracle's list_position over the rank-ordered pair list.
  */
final class MergeTable(val merges: Array[(String, String)]) extends Serializable {
  private val SEP = "\u0001"

  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      m.putIfAbsent(merges(i)._1 + SEP + merges(i)._2, Integer.valueOf(i))
      i += 1
    }
    m
  }

  /** Standard BPE encode of one word (see class doc). O(L²) worst case
    * over the word length — words are short; the doc-level cost is the
    * same single map pass as the greedy matcher. */
  def encode(w: String): Array[String] = {
    val n = w.length
    if (n == 0) return Array.empty
    val toks = new java.util.ArrayList[String](n)
    var i = 0
    while (i < n) { toks.add(String.valueOf(w.charAt(i))); i += 1 }
    var more = true
    while (more && toks.size > 1) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var j = 0
      while (j < toks.size - 1) {
        val r = rank.get(toks.get(j) + SEP + toks.get(j + 1))
        if (r != null && r.intValue() < bestRank) { bestRank = r.intValue(); bestPos = j }
        j += 1
      }
      if (bestPos < 0) more = false
      else {
        toks.set(bestPos, toks.get(bestPos) + toks.get(bestPos + 1))
        toks.remove(bestPos + 1)
      }
    }
    val out = new Array[String](toks.size)
    var k = 0
    while (k < out.length) { out(k) = toks.get(k); k += 1 }
    out
  }

  /** Single-word encode for codegen: UTF8String in, array<string> out.
    * Used by the tier-2 merge FIT (pair counting over the tier-1
    * re-encoded token stream). */
  def encodeTokens(w: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val pieces = encode(w.toString)
    val out = new Array[Any](pieces.length)
    var i = 0
    while (i < pieces.length) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(pieces(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Per-doc merge-encode stats over a whitespace-token array — the
    * BpeMatcher.stats digest discipline (position-keyed piece-sequence
    * digest, codePointAt head) over merge-order pieces. */
  def stats(tokens: ArrayData): InternalRow = {
    var nPieces = 0L
    var acc = 0L
    val n = tokens.numElements()
    var wi = 0
    while (wi < n) {
      val w = if (tokens.isNullAt(wi)) "" else tokens.getUTF8String(wi).toString
      val pieces = encode(w)
      var dig = 0L
      var k = 0
      while (k < pieces.length) {
        val p = pieces(k)
        dig = (dig * 31L + p.length.toLong + p.codePointAt(0).toLong) % 1000000007L
        nPieces += 1L
        k += 1
      }
      acc += (wi + 1).toLong * 1000003L + dig
      wi += 1
    }
    InternalRow(nPieces, acc)
  }
}

/** struct(n_tokens_merge, merge_digest) over an array<string> token
  * column — see [[MergeTable]]. */
case class BpeMergeStats(child: Expression, table: MergeTable)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_merge_stats expects array<string>, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens_merge", LongType, nullable = false),
    StructField("merge_digest", LongType, nullable = false)))

  override protected def withNewChildInternal(c: Expression): BpeMergeStats =
    copy(child = c)

  override def nullSafeEval(a: Any): Any =
    table.stats(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("mergeTable", table, classOf[MergeTable].getName)
    defineCodeGen(ctx, ev, x => s"$m.stats($x)")
  }
}

/** Merge-encode ONE word (string → array<string> of pieces) — the
  * tier-2 fit's candidate stream; see [[MergeTable.encodeTokens]]. */
case class BpeMergeEncode(child: Expression, table: MergeTable)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_merge_encode expects string, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def withNewChildInternal(c: Expression): BpeMergeEncode =
    copy(child = c)

  override def nullSafeEval(a: Any): Any =
    table.encodeTokens(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("mergeTable", table, classOf[MergeTable].getName)
    defineCodeGen(ctx, ev, x => s"$m.encodeTokens($x)")
  }
}

object SubwordExpressions {
  /** Column-level subword stats over an array<string> token column. */
  def bpeStats(tokens: Column, matcher: BpeMatcher): Column =
    org.apache.spark.sql.graft.Bridge.toColumn(
      BpeStats(org.apache.spark.sql.graft.Bridge.toExpression(tokens), matcher))

  /** Column-level merge-order stats over an array<string> token column. */
  def bpeMergeStats(tokens: Column, table: MergeTable): Column =
    org.apache.spark.sql.graft.Bridge.toColumn(
      BpeMergeStats(org.apache.spark.sql.graft.Bridge.toExpression(tokens), table))

  /** Column-level merge-encode of a single word column. */
  def bpeMergeEncode(word: Column, table: MergeTable): Column =
    org.apache.spark.sql.graft.Bridge.toColumn(
      BpeMergeEncode(org.apache.spark.sql.graft.Bridge.toExpression(word), table))
}
