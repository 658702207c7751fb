package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BYTE-LEVEL BPE support: the reversible byte↔unicode remap of the
  * GPT-2 tokenizer family (Radford et al. 2019 — the published
  * `bytes_to_unicode` construction). A word is re-expressed as its
  * UTF-8 bytes, each byte as ONE visible, whitespace-free BMP
  * character: the 188 printable non-space latin-1 bytes
  * (`!`..`~`, `¡`..`¬`, `®`..`ÿ`) map to themselves, and the remaining
  * 68 bytes map to U+0100 + n in ascending-byte order (so space 0x20
  * becomes U+0120 — the familiar `Ġ`). BPE then runs over these byte
  * symbols with the ENGINE'S EXISTING machinery unchanged —
  * [[graft.operators.LmOps.bpeTrainFast]] seeds from a per-character
  * split, and every remapped character IS one byte — which means
  *
  *   - no UNK is possible by construction: every symbol the apply scan
  *     can ever produce is a concatenation of remap characters, and the
  *     256-entry base alphabet plus the merge outputs is total over
  *     those ([[vocabIds]]);
  *   - tokenization is REVERSIBLE for arbitrary input — [[invert]]
  *     recovers the exact original string from the symbol stream.
  *
  * The remap table is a deterministic pinned CONTRACT (the
  * [[BpeEncodeExpr.ChecksumOffset]] convention): engine and witness
  * share these constants while the mechanisms around them — trainer,
  * apply scan, id fold — stay independent. */
object ByteBpe {

  /** byte value → its remap character (a 1-char String). */
  val byteToChar: Array[String] = {
    val printable = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[String](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (printable(b)) out(b) = String.valueOf(b.toChar)
      else { out(b) = String.valueOf((256 + n).toChar); n += 1 }
      b += 1
    }
    out
  }

  /** remap character → byte value (the inverse — total on the 256
    * remap characters, absent everywhere else). */
  val charToByte: Map[Char, Int] =
    byteToChar.iterator.zipWithIndex.map { case (s, b) => s.charAt(0) -> b }
      .toMap

  /** Driver-side remap: the UTF-8 bytes of `w`, each as its remap
    * character. The witness-side twin of [[ByteRemapExpr]]. */
  def remap(w: String): String = {
    val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(byteToChar(bytes(i) & 0xFF).charAt(0))
      i += 1
    }
    sb.toString
  }

  /** Exact inverse of [[remap]] over any concatenation of byte symbols
    * — the decode path that makes byte-level tokenization lossless.
    * Throws on a character outside the remap alphabet (a symbol that
    * cannot have come from [[remap]]). */
  def invert(symbols: String): String = {
    val bytes = new Array[Byte](symbols.length)
    var i = 0
    while (i < symbols.length) {
      bytes(i) = charToByte.getOrElse(symbols.charAt(i),
        sys.error(s"not a byte symbol: U+${symbols.charAt(i).toInt.toHexString}")
      ).toByte
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The byte-level id layout (GPT-2 convention): ids 0..255 ARE the
    * byte values — fixed, corpus-independent — and merge output r takes
    * id 256 + r − 1. Total over every symbol the apply scan can emit,
    * so the [[BpeEncodeExpr]] out-of-vocabulary contribution (0) is
    * unreachable: no UNK, by construction. */
  def vocabIds(merges: Seq[graft.operators.LmOps.BpeMerge]): Map[String, Int] = {
    val base = byteToChar.iterator.zipWithIndex
      .map { case (s, b) => s -> b }.toMap
    merges.foldLeft(base) { (acc, m) =>
      if (acc.contains(m.merged)) acc else acc + (m.merged -> (256 + m.rank - 1))
    }
  }
}

/** One narrow per-row pass remapping a string to its byte symbols
  * ([[ByteBpe.remap]] as a codegen'd Catalyst expression) — the seed
  * transform that turns the engine's character-level BPE machinery
  * byte-level without touching the trainer, apply scan, or encode
  * kernels. */
case class ByteRemapExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override protected def withNewChildInternal(c: Expression): ByteRemapExpr =
    copy(child = c)
  override def prettyName: String = "byte_remap"

  def remap(u: UTF8String): UTF8String = {
    val bytes = u.getBytes
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(ByteBpe.byteToChar(bytes(i) & 0xFF).charAt(0))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(v: Any): Any = remap(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteRemap", this,
      classOf[ByteRemapExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.remap($c);")
  }
}

object ByteRemapExpr {
  import org.apache.spark.sql.graftbridge.Bridge
  def of(v: Column): Column = Bridge.column(ByteRemapExpr(Bridge.expression(v)))
}
