package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE symbol count of a word under a fixed merge table — the native
  * one-pass kernel behind q130/q132's apply stage: code-point split,
  * then per rule a left-to-right non-overlapping scan merge, all on
  * flat arrays. O(len · rules) per word, zero per-element array
  * copying.
  *
  * The declarative parity witness is [[graft.operators.LmOps
  * .bpeSymbolCount]] (the aggregate-fold form — same scan semantics by
  * the LmOpsSpec fold-equals-scan pin, but its per-element accumulator
  * concat is quadratic in word length, measured 13 s vs sub-second at
  * sf0.1). The PropertySpec law holds all three implementations —
  * native kernel, fold, witness index scan — equal over random words
  * and chained merge tables, including the alternating-pair runs a
  * single-pass string replace gets wrong. */
case class BpeApplyExpr(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override protected def withNewChildInternal(c: Expression): BpeApplyExpr =
    copy(child = c)
  override def prettyName: String = "bpe_symbol_count"

  @transient private lazy val mergeA: Array[String] = merges.map(_._1).toArray
  @transient private lazy val mergeB: Array[String] = merges.map(_._2).toArray

  /** Instance entry point shared by eval and codegen. */
  def scanCount(w: UTF8String): Int =
    BpeApplyExpr.scanCount(w.toString, mergeA, mergeB)

  override def nullSafeEval(v: Any): Any =
    Integer.valueOf(scanCount(v.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeApply", this, classOf[BpeApplyExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.scanCount($c);")
  }
}

object BpeApplyExpr {

  /** Code-point split + per-rule scan merge over reusable arrays. */
  def scanCount(w: String, a: Array[String], b: Array[String]): Int = {
    if (w.isEmpty) return 0
    // code-point split
    var syms = new Array[String](w.length)
    var n = 0
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val cc = Character.charCount(cp)
      syms(n) = w.substring(i, i + cc)
      n += 1
      i += cc
    }
    // per rule: left-to-right non-overlapping merge, compacting in place
    var r = 0
    while (r < a.length && n > 1) {
      val ra = a(r); val rb = b(r)
      var out = 0
      var j = 0
      while (j < n) {
        if (j + 1 < n && syms(j) == ra && syms(j + 1) == rb) {
          syms(out) = ra + rb; j += 2
        } else {
          syms(out) = syms(j); j += 1
        }
        out += 1
      }
      n = out
      r += 1
    }
    n
  }

  import org.apache.spark.sql.graftbridge.Bridge
  def of(word: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeApplyExpr(Bridge.expression(word), merges))
}
