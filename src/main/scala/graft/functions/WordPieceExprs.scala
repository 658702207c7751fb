package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Engine kernels for the WordPiece tokenizer family
  * ([[graft.operators.WordPiece]]) — the third tokenizer a training
  * pipeline ships next to BPE (merge-table) and unigram-LM (Viterbi):
  * greedy LONGEST-MATCH-FIRST segmentation against a flat vocabulary
  * whose continuation pieces carry the `##` prefix (the BERT
  * convention; Devlin et al. 2019, and the published
  * WordpieceTokenizer reference algorithm).
  *
  * The PINNED segmentation contract (shared with the independent
  * witness, [[graft.operators.WordPiece.encodeWitness]]):
  *   - per word, scan from the left; at each position take the LONGEST
  *     code-point substring (≤ [[UnigramViterbi.MaxPieceLen]] cps)
  *     present in the vocabulary — looked up as-is at word start,
  *     `##`-prefixed at any later position;
  *   - if NO piece matches at some position, the WHOLE word degrades
  *     to a single UNK piece (the reference algorithm's
  *     `is_bad` path) — it counts 1 toward n_pieces, increments
  *     n_unk, and contributes 0 to the id checksum (loud);
  *   - empty tokens contribute nothing.
  */
object WordPieceKernel {

  /** Greedy longest-match of one word against the vocab; appends piece
    * STRINGS (continuations carrying `##`) to `out`. Returns the piece
    * count, or −1 if the word is UNK. */
  def matchWord(w: String, vocab: java.util.HashMap[String, java.lang.Integer],
      out: Array[String]): Int = {
    val nCp = w.codePointCount(0, w.length)
    val cps = new Array[Int](nCp + 1)
    var i = 0
    var n = 0
    while (i < w.length) {
      cps(n) = i; i += Character.charCount(w.codePointAt(i)); n += 1
    }
    cps(n) = w.length
    var out0 = 0
    var p = 0
    while (p < n) {
      var len = math.min(UnigramViterbi.MaxPieceLen, n - p)
      var taken = -1
      while (len >= 1 && taken < 0) {
        val sub = w.substring(cps(p), cps(p + len))
        val key = if (p == 0) sub else "##" + sub
        if (vocab.containsKey(key)) {
          out(out0) = key
          taken = len
        }
        len -= 1
      }
      if (taken < 0) return -1 // is_bad: whole word is UNK
      out0 += 1
      p += taken
    }
    out0
  }
}

/** Whole-document WordPiece encode: greedy-match every token, fold the
  * ordered id sequence into (n_pieces, n_unk, checksum) — the
  * [[BpeEncodeExpr]] checksum contract (h = h·P + (id+1); an UNK word
  * is ONE piece contributing 0, so vocabulary holes are loud). */
case class WordPieceEncodeExpr(child: Expression, pieceIds: Map[String, Int])
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", LongType, nullable = false),
    StructField("n_unk", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false)))
  override protected def withNewChildInternal(c: Expression): WordPieceEncodeExpr =
    copy(child = c)
  override def prettyName: String = "wordpiece_encode"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"wordpiece_encode needs ARRAY<STRING>, got ${other.sql}")
    }

  @transient private lazy val vocab: java.util.HashMap[String, java.lang.Integer] = {
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
    var unk = 0L
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
        val m = WordPieceKernel.matchWord(w, vocab, scratch)
        if (m < 0) {
          n += 1; unk += 1
          h = h * BpeEncodeExpr.ChecksumPrime // UNK contributes 0
        } else {
          var j = 0
          while (j < m) {
            val id = vocab.get(scratch(j))
            h = h * BpeEncodeExpr.ChecksumPrime + (id.intValue() + 1L)
            j += 1
          }
          n += m
        }
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, unk, h))
  }

  override def nullSafeEval(v: Any): Any = encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpEnc", this,
      classOf[WordPieceEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }
}

object WordPieceEncodeExpr {
  import org.apache.spark.sql.graftbridge.Bridge
  def of(tokens: Column, pieceIds: Map[String, Int]): Column =
    Bridge.column(WordPieceEncodeExpr(Bridge.expression(tokens), pieceIds))
}
