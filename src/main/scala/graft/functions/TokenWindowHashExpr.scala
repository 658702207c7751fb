package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-position n-TOKEN window hashes of a text column in ONE pass and
  * with ZERO string materialization — the probe kernel for gram-keyed
  * Bloom membership at corpus scale. The string path builds an n-token
  * gram string per position (O(text·n) byte traffic corpus-wide) just to
  * hash it; this kernel computes per-token FNV-1a64 while scanning the
  * UTF-8 bytes once, then rolls a wrapping polynomial over the token
  * hashes: H_i = Σ h_{i+j}·P^{n-1-j} (mod 2^64), updated in O(1) per
  * position.
  *
  * Whitespace is exactly Java's `\s` class over ASCII — space, \t, \n,
  * \x0B, \f, \r — all single-byte in UTF-8 and never part of a
  * multibyte sequence, so the byte-level scan tokenizes identically to
  * `TextFunctions.tokens`' regex split. A gram STRING built by
  * `concat_ws(" ", tokens)` therefore hashes to exactly the same window
  * value through this kernel (its single window), which is what lets a
  * tiny bench side key a Bloom filter off gram strings while the corpus
  * probe never builds one.
  *
  * Under-n inputs yield ONE hash — the fold over however many tokens
  * there are (zero tokens fold to 0) — mirroring `wordShingles`' whole-
  * text single-gram convention, so a short bench gram and the short doc
  * that equals it meet in the bloom exactly like their strings meet in
  * the exact join. No-false-negative candidate generation therefore
  * holds for EVERY document length, not just docs with >= n tokens.
  */
case class TokenWindowHashExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def withNewChildInternal(c: Expression): TokenWindowHashExpr =
    copy(child = c)
  override def prettyName: String = "token_window_hashes"

  override def nullSafeEval(v: Any): Any =
    TokenWindowHashExpr.kernel(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenWindowHashExpr$$.MODULE$$" +
        s".kernel($c, $n);")
}

object TokenWindowHashExpr {
  private val FnvOffset = -3750763034362895579L // 0xcbf29ce484222325
  private val FnvPrime = 1099511628211L         // 0x100000001b3
  private val P = 1099511628211L                // window-combine base (odd)

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def kernel(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    // pass 1 is fused into the scan: token FNVs into a doubling buffer
    var hs = new Array[Long](16)
    var nTok = 0
    var h = FnvOffset
    var inTok = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (isWs(b)) {
        if (inTok) {
          if (nTok == hs.length) hs = java.util.Arrays.copyOf(hs, nTok * 2)
          hs(nTok) = h; nTok += 1; inTok = false
        }
      } else {
        if (!inTok) { h = FnvOffset; inTok = true }
        h = (h ^ (b & 0xffL)) * FnvPrime
      }
      i += 1
    }
    if (inTok) {
      if (nTok == hs.length) hs = java.util.Arrays.copyOf(hs, nTok * 2)
      hs(nTok) = h; nTok += 1
    }
    if (nTok < n) {
      // whole-text single-gram convention: one fold over all nTok
      // tokens (nTok == 0 folds to 0 — the empty-text gram)
      var w0 = 0L
      var j = 0
      while (j < nTok) { w0 = w0 * P + hs(j); j += 1 }
      return new GenericArrayData(Array(w0))
    }
    // P^(n-1) mod 2^64 for the O(1) rolling update
    var pow = 1L
    i = 0
    while (i < n - 1) { pow *= P; i += 1 }
    val out = new Array[Long](nTok - n + 1)
    var w = 0L
    i = 0
    while (i < n) { w = w * P + hs(i); i += 1 }
    out(0) = w
    i = n
    while (i < nTok) {
      w = (w - hs(i - n) * pow) * P + hs(i)
      out(i - n + 1) = w
      i += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graftbridge.Bridge
  def of(text: Column, n: Int): Column =
    Bridge.column(TokenWindowHashExpr(Bridge.expression(text), n))
}
