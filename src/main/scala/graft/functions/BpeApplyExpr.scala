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
  @transient private lazy val mergeAB: Array[String] =
    BpeApplyExpr.mergedTable(mergeA, mergeB)

  /** Instance entry point shared by eval and codegen. */
  def scanCount(w: UTF8String): Int =
    BpeApplyExpr.scanCount(w.toString, mergeA, mergeB, mergeAB)

  override def nullSafeEval(v: Any): Any =
    Integer.valueOf(scanCount(v.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeApply", this, classOf[BpeApplyExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.scanCount($c);")
  }
}

/** Batch BPE merge application over a SYMBOL ARRAY — the incremental
  * trainer's per-batch rewrite kernel ([[graft.operators.LmOps
  * .bpeTrainFast]]): applies the batch's rules in rank order with the
  * same left-to-right non-overlapping scan as [[BpeApplyExpr]], but in
  * array-in/array-out form so the trainer's histogram keeps its symbol
  * frames native. Shares [[BpeApplyExpr.scanSyms]] with the count
  * kernel, so the PropertySpec three-implementation law covers this
  * scan too. */
case class BpeApplyArrayExpr(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override protected def withNewChildInternal(c: Expression): BpeApplyArrayExpr =
    copy(child = c)
  override def prettyName: String = "bpe_apply_syms"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_apply_syms needs ARRAY<STRING>, got ${other.sql}")
    }

  @transient private lazy val mergeA: Array[String] = merges.map(_._1).toArray
  @transient private lazy val mergeB: Array[String] = merges.map(_._2).toArray
  @transient private lazy val mergeAB: Array[String] =
    BpeApplyExpr.mergedTable(mergeA, mergeB)

  /** Instance entry point shared by eval and codegen. */
  def applyBatch(arr: ArrayData): ArrayData = {
    val n0 = arr.numElements()
    val syms = new Array[String](n0)
    var i = 0
    while (i < n0) {
      // null elements (containsNull inputs) degrade to "" rather than NPE
      val u = arr.getUTF8String(i)
      syms(i) = if (u eq null) "" else u.toString
      i += 1
    }
    val n = BpeApplyExpr.scanSyms(syms, n0, mergeA, mergeB, mergeAB)
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(syms(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = applyBatch(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeApplyArr", this,
      classOf[BpeApplyArrayExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.applyBatch($c);")
  }
}

object BpeApplyArrayExpr {
  import org.apache.spark.sql.graftbridge.Bridge
  def of(syms: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeApplyArrayExpr(Bridge.expression(syms), merges))
}

/** Per-LEVEL pair-count deltas of applying a speculative BPE merge
  * batch to one word — the validation feed for [[graft.operators.LmOps
  * .bpeTrainFast]]. For each rule l (1-based) that CHANGES the word,
  * emits the word's full adjacent-pair list before the rule with
  * weight −1 per occurrence and after it with +1 (unchanged levels
  * emit nothing, so output is proportional to touched (word, level)
  * pairs, not batch size × vocabulary). Aggregated as Σ w·n per
  * (lvl, a, b), these deltas let the driver replay the EXACT pair-count
  * evolution of the sequential algorithm through the batch and verify
  * each speculated rule was the true argmax at its step. */
case class BpeBatchDeltaExpr(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.types._

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("lvl", IntegerType, nullable = false),
    StructField("a", StringType, nullable = false),
    StructField("b", StringType, nullable = false),
    StructField("w", IntegerType, nullable = false))), containsNull = false)
  override protected def withNewChildInternal(c: Expression): BpeBatchDeltaExpr =
    copy(child = c)
  override def prettyName: String = "bpe_batch_delta"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_batch_delta needs ARRAY<STRING>, got ${other.sql}")
    }

  @transient private lazy val mergeA: Array[String] = merges.map(_._1).toArray
  @transient private lazy val mergeB: Array[String] = merges.map(_._2).toArray
  @transient private lazy val mergeAB: Array[String] =
    BpeApplyExpr.mergedTable(mergeA, mergeB)

  /** Instance entry point shared by eval and codegen. */
  def deltasOf(arr: ArrayData): ArrayData = {
    val n0 = arr.numElements()
    var cur = new Array[String](n0)
    var i = 0
    while (i < n0) {
      val u = arr.getUTF8String(i)
      cur(i) = if (u eq null) "" else u.toString // null-tolerant, like applyBatch
      i += 1
    }
    var n = n0
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    def emit(lvl: Int, syms: Array[String], len: Int, w: Int): Unit = {
      var j = 0
      while (j + 1 < len) {
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](lvl, UTF8String.fromString(syms(j)),
            UTF8String.fromString(syms(j + 1)), w))
        j += 1
      }
    }
    var l = 0
    while (l < mergeA.length && n > 1) {
      val next = new Array[String](n)
      System.arraycopy(cur, 0, next, 0, n)
      val m = BpeApplyExpr.scanOneRule(next, n, mergeA(l), mergeB(l), mergeAB(l))
      if (m != n) {
        emit(l + 1, cur, n, -1)
        emit(l + 1, next, m, 1)
        cur = next
        n = m
      }
      l += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def nullSafeEval(v: Any): Any = deltasOf(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeBatchDelta", this,
      classOf[BpeBatchDeltaExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.deltasOf($c);")
  }
}

object BpeBatchDeltaExpr {
  import org.apache.spark.sql.graftbridge.Bridge
  def of(syms: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeBatchDeltaExpr(Bridge.expression(syms), merges))
}

object BpeApplyExpr {

  /** Shared single-char strings for the ASCII range — the overwhelming
    * majority of split symbols on natural-language corpora; skips one
    * `substring` allocation per ASCII code point. Equality-compared
    * only (the scan uses ==/equals, never reference identity). */
  private val AsciiSyms: Array[String] =
    Array.tabulate(128)(c => String.valueOf(c.toChar))

  /** One rule's left-to-right non-overlapping scan merge, compacting
    * `syms(0 until n)` in place; returns the new symbol count. `rab`
    * is the precomputed merged string (== ra + rb) — precomputed ONCE
    * per rule table instead of allocated per merge occurrence. */
  def scanOneRule(syms: Array[String], n: Int, ra: String, rb: String,
      rab: String): Int = {
    var out = 0
    var j = 0
    while (j < n) {
      if (j + 1 < n && syms(j) == ra && syms(j + 1) == rb) {
        syms(out) = rab; j += 2
      } else {
        syms(out) = syms(j); j += 1
      }
      out += 1
    }
    out
  }

  def scanOneRule(syms: Array[String], n: Int, ra: String, rb: String): Int =
    scanOneRule(syms, n, ra, rb, ra + rb)

  /** Precomputed merged-string table for a rule table — build once per
    * expression instance, pass to the 5-arg [[scanSyms]]. */
  def mergedTable(a: Array[String], b: Array[String]): Array[String] =
    Array.tabulate(a.length)(r => a(r) + b(r))

  /** Rank-ordered scan merge of a rule table, compacting `syms(0 until
    * n0)` in place; returns the new symbol count. The one scan all
    * three kernels ([[BpeApplyExpr]], [[BpeApplyArrayExpr]],
    * [[BpeBatchDeltaExpr]]) share. `ab` is [[mergedTable]](a, b). */
  def scanSyms(syms: Array[String], n0: Int,
      a: Array[String], b: Array[String], ab: Array[String]): Int = {
    var n = n0
    var r = 0
    while (r < a.length && n > 1) {
      n = scanOneRule(syms, n, a(r), b(r), ab(r))
      r += 1
    }
    n
  }

  def scanSyms(syms: Array[String], n0: Int,
      a: Array[String], b: Array[String]): Int =
    scanSyms(syms, n0, a, b, mergedTable(a, b))

  /** Code-point split into `syms` (caller-sized ≥ w.length); returns
    * the symbol count. ASCII code points reuse the shared table. */
  def splitSyms(w: String, syms: Array[String]): Int = {
    var n = 0
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val cc = Character.charCount(cp)
      syms(n) = if (cp < 128) AsciiSyms(cp) else w.substring(i, i + cc)
      n += 1
      i += cc
    }
    n
  }

  /** Code-point split + per-rule scan merge over reusable arrays. */
  def scanCount(w: String, a: Array[String], b: Array[String],
      ab: Array[String]): Int = {
    if (w.isEmpty) return 0
    val syms = new Array[String](w.length)
    val n = splitSyms(w, syms)
    scanSyms(syms, n, a, b, ab)
  }

  def scanCount(w: String, a: Array[String], b: Array[String]): Int =
    scanCount(w, a, b, mergedTable(a, b))

  import org.apache.spark.sql.graftbridge.Bridge
  def of(word: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeApplyExpr(Bridge.expression(word), merges))
}
