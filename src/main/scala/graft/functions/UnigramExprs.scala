package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The ENGINE-side kernels of the unigram-LM (SentencePiece-style)
  * tokenizer ([[graft.operators.UnigramLm]]): candidate substring
  * explosion, Viterbi segmentation under an integer cost table, and
  * whole-document encode-to-ids. All three are pure per-row scalars
  * with real codegen — the trainer's only aggregation is the
  * explode+groupBy around them, and the only driver state is the
  * vocabulary-shaped cost table (the capped-model convention).
  *
  * The segmentation CONTRACT (shared with the independent witness,
  * [[graft.operators.UnigramLm.segmentWitness]], which implements it
  * by memoized recursion instead of this iterative DP):
  *   - pieces are code-point substrings, max [[UnigramViterbi.MaxPieceLen]];
  *   - a segmentation's score is (total cost, piece count), minimized
  *     lexicographically;
  *   - among minimal segmentations, at each position FROM THE LEFT the
  *     LONGEST piece that still reaches a minimal suffix is taken;
  *   - a code point absent from the vocabulary segments as itself at
  *     [[UnigramViterbi.unknownCost]] (kept total; the encode fold then
  *     contributes 0 for it, so a vocabulary hole is loud, not silent).
  */
object UnigramViterbi {

  /** Max piece length in CODE POINTS — bounds the DP inner loop and the
    * candidate space (SentencePiece's max_sentencepiece_length analog,
    * here fixed so engine/witness/oracle agree by construction). */
  val MaxPieceLen = 6

  /** Integer cost law over the current counts: c ≥ 1 costs
    * `1 + floor(log2(N div c))` bits (≥ 1, so no free pieces); a
    * RETAINED piece at count 0 (protected alphabet) costs one more
    * than the count-1 worst case; an UNKNOWN code point one more than
    * that. All exact integer arithmetic — see LmOps' bitLen argument. */
  def bitLen(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
  def cost(n: Long, c: Long): Long =
    if (c >= 1L) 1L + bitLen(math.max(1L, n / c)) else 2L + bitLen(math.max(1L, n))
  def unknownCost(n: Long): Long = 3L + bitLen(math.max(1L, n))

  /** Iterative right-to-left DP over one word. Returns the number of
    * pieces written to `outPieces` (caller-sized ≥ cp count). The
    * forward reconstruction takes, at each position, the longest len
    * whose (cost, count) matches the position's optimum — the pinned
    * longest-from-the-left tie-break. */
  def segment(w: String, costs: java.util.HashMap[String, java.lang.Long],
      unkCost: Long, outPieces: Array[String]): Int = {
    // code-point start offsets (UTF-16 indices), cps(i) .. cps(i+1)
    val nCp0 = w.codePointCount(0, w.length)
    val cps = new Array[Int](nCp0 + 1)
    var i = 0
    var n = 0
    while (i < w.length) {
      cps(n) = i
      i += Character.charCount(w.codePointAt(i))
      n += 1
    }
    cps(n) = w.length
    // DP from the right: bestCost/bestCnt at cp index i over suffix
    val bestCost = new Array[Long](n + 1)
    val bestCnt = new Array[Int](n + 1)
    var p = n - 1
    while (p >= 0) {
      var bc = Long.MaxValue
      var bn = Int.MaxValue
      var len = 1
      val maxLen = math.min(MaxPieceLen, n - p)
      while (len <= maxLen) {
        val piece = w.substring(cps(p), cps(p + len))
        val c = costs.get(piece)
        val pc = if (c eq null) { if (len == 1) unkCost else Long.MaxValue }
          else c.longValue()
        if (pc != Long.MaxValue) {
          val tc = pc + bestCost(p + len)
          val tn = 1 + bestCnt(p + len)
          if (tc < bc || (tc == bc && tn < bn)) { bc = tc; bn = tn }
        }
        len += 1
      }
      bestCost(p) = bc
      bestCnt(p) = bn
      p -= 1
    }
    // forward reconstruction, longest piece first on ties
    var out = 0
    var q = 0
    while (q < n) {
      val maxLen = math.min(MaxPieceLen, n - q)
      var take = 1
      var len = maxLen
      var found = false
      while (len >= 1 && !found) {
        val piece = w.substring(cps(q), cps(q + len))
        val c = costs.get(piece)
        val pc = if (c eq null) { if (len == 1) unkCost else Long.MaxValue }
          else c.longValue()
        if (pc != Long.MaxValue && pc + bestCost(q + len) == bestCost(q) &&
          1 + bestCnt(q + len) == bestCnt(q)) {
          take = len
          found = true
        }
        len -= 1
      }
      outPieces(out) = w.substring(cps(q), cps(q + take))
      out += 1
      q += take
    }
    out
  }

  /** Build the executor-side cost table once per expression instance. */
  def costTable(costs: Seq[(String, Long)]): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](
      math.max(16, (costs.size / 0.75).toInt + 1))
    costs.foreach { case (s, c) => m.put(s, java.lang.Long.valueOf(c)) }
    m
  }
}

/** All candidate substrings (code-point based, overlapping, length
  * 1..maxLen) of a word — the tokenizer trainers' seed-count explode.
  * Output multiplicity matters: each start position contributes one
  * element, so explode+groupBy(sum(n)) yields the weighted occurrence
  * counts the seed law pins.
  *
  * `contPrefix` parameterizes the vocabulary form: "" for unigram-LM
  * (position-blind pieces); "##" for WordPiece, where a substring at
  * position > 0 emits prefixed (the BERT continuation convention) —
  * ONE expression serves both trainers so the candidate enumeration
  * cannot drift between the families. */
case class UnigramCandidatesExpr(child: Expression, maxLen: Int,
    contPrefix: String)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def withNewChildInternal(c: Expression): UnigramCandidatesExpr =
    copy(child = c)
  override def prettyName: String =
    if (contPrefix.isEmpty) "unigram_candidates" else "wordpiece_candidates"

  def candidates(u: UTF8String): ArrayData = {
    val w = u.toString
    val nCp = w.codePointCount(0, w.length)
    val cps = new Array[Int](nCp + 1)
    var i = 0
    var n = 0
    while (i < w.length) {
      cps(n) = i; i += Character.charCount(w.codePointAt(i)); n += 1
    }
    cps(n) = w.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](n * maxLen)
    var s = 0
    while (s < n) {
      var len = 1
      val top = math.min(maxLen, n - s)
      while (len <= top) {
        val sub = w.substring(cps(s), cps(s + len))
        out += UTF8String.fromString(
          if (s == 0 || contPrefix.isEmpty) sub else contPrefix + sub)
        len += 1
      }
      s += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(v: Any): Any = candidates(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramCand", this,
      classOf[UnigramCandidatesExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.candidates($c);")
  }
}

object UnigramCandidatesExpr {
  import org.apache.spark.sql.graftbridge.Bridge
  def of(word: Column, maxLen: Int = UnigramViterbi.MaxPieceLen,
      contPrefix: String = ""): Column =
    Bridge.column(UnigramCandidatesExpr(Bridge.expression(word), maxLen,
      contPrefix))
}

/** Viterbi segmentation of one word under a fixed integer cost table —
  * the E-step kernel: emits the piece sequence so the trainer's
  * explode+groupBy(sum(n)) recounts pieces distributedly. */
case class UnigramSegmentExpr(child: Expression, costs: Seq[(String, Long)],
    unkCost: Long)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def withNewChildInternal(c: Expression): UnigramSegmentExpr =
    copy(child = c)
  override def prettyName: String = "unigram_segment"

  @transient private lazy val table = UnigramViterbi.costTable(costs)
  // thread-local scratch: the expression is not marked stateful, so a
  // shared-instance evaluation path is legal — see BpeEncodeExpr
  @transient private lazy val scratchTL: ThreadLocal[Array[String]] =
    ThreadLocal.withInitial(() => new Array[String](64))

  def segmentOf(u: UTF8String): ArrayData = {
    val w = u.toString
    if (w.isEmpty) return new GenericArrayData(Array.empty[Any])
    var scratch = scratchTL.get()
    if (scratch.length < w.length) {
      scratch = new Array[String](math.max(64, w.length * 2))
      scratchTL.set(scratch)
    }
    val n = UnigramViterbi.segment(w, table, unkCost, scratch)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = UTF8String.fromString(scratch(i)); i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = segmentOf(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramSeg", this,
      classOf[UnigramSegmentExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.segmentOf($c);")
  }
}

object UnigramSegmentExpr {
  import org.apache.spark.sql.graftbridge.Bridge
  def of(word: Column, costs: Seq[(String, Long)], unkCost: Long): Column =
    Bridge.column(UnigramSegmentExpr(Bridge.expression(word), costs, unkCost))
}

/** Whole-document unigram encode: segment every token of the input
  * array under the trained cost table, map pieces to vocabulary ids,
  * fold the ordered id sequence into (n_pieces, checksum) — the
  * [[BpeEncodeExpr]] shape and checksum contract (h = h·P + (id+1),
  * unknown piece contributes 0 loudly). */
case class UnigramEncodeExpr(child: Expression, costs: Seq[(String, Long)],
    unkCost: Long, pieceIds: Map[String, Int])
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false)))
  override protected def withNewChildInternal(c: Expression): UnigramEncodeExpr =
    copy(child = c)
  override def prettyName: String = "unigram_encode"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unigram_encode needs ARRAY<STRING>, got ${other.sql}")
    }

  @transient private lazy val table = UnigramViterbi.costTable(costs)
  @transient private lazy val ids: java.util.HashMap[String, java.lang.Integer] = {
    val m = new java.util.HashMap[String, java.lang.Integer](
      math.max(16, (pieceIds.size / 0.75).toInt + 1))
    pieceIds.foreach { case (s, i) => m.put(s, java.lang.Integer.valueOf(i)) }
    m
  }
  // thread-local scratch — see BpeEncodeExpr's shared-instance rationale
  @transient private lazy val scratchTL: ThreadLocal[Array[String]] =
    ThreadLocal.withInitial(() => new Array[String](64))

  def encode(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    var n = 0L
    var h = BpeEncodeExpr.ChecksumOffset
    val nTok = arr.numElements()
    var scratch = scratchTL.get()
    var t = 0
    while (t < nTok) {
      val u = arr.getUTF8String(t)
      val w = if (u eq null) "" else u.toString
      if (w.nonEmpty) {
        if (scratch.length < w.length) {
          scratch = new Array[String](math.max(64, w.length * 2))
          scratchTL.set(scratch)
        }
        val m = UnigramViterbi.segment(w, table, unkCost, scratch)
        var j = 0
        while (j < m) {
          val id = ids.get(scratch(j))
          h = h * BpeEncodeExpr.ChecksumPrime +
            (if (id eq null) 0L else id.intValue() + 1L)
          j += 1
        }
        n += m
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, h))
  }

  override def nullSafeEval(v: Any): Any = encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramEnc", this,
      classOf[UnigramEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }
}

object UnigramEncodeExpr {
  import org.apache.spark.sql.graftbridge.Bridge
  def of(tokens: Column, costs: Seq[(String, Long)], unkCost: Long,
      pieceIds: Map[String, Int]): Column =
    Bridge.column(UnigramEncodeExpr(Bridge.expression(tokens), costs,
      unkCost, pieceIds))
}
