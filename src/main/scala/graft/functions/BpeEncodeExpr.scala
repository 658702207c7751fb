package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document BPE ENCODE over an ordered token array: apply the
  * merge table per token (the shared [[BpeApplyExpr.scanSyms]] scan),
  * map each resulting symbol to its vocabulary id, and fold the
  * ordered id sequence into (n_ids, checksum) — the tokenize-to-ids
  * stage a training pipeline actually ships, reduced to a comparable
  * row (the full id array would bloat the result set; the wrapping
  * polynomial checksum `h = h·P + (id+1)` over the EXACT sequence
  * pins order, boundaries, and every id value).
  *
  * The id table materializes once per expression instance as a
  * `String`-keyed HashMap — the scan already produces `String`
  * symbols, so keying by `String` (unlike the `UTF8String`-keyed
  * [[VocabSurprisalSumExpr]], whose probes arrive as `UTF8String`)
  * avoids a `UTF8String.fromString` allocation per symbol lookup. An
  * out-of-vocabulary symbol (impossible when the alphabet was derived
  * from the same corpus, kept total for safety) contributes 0 to the
  * fold — real ids contribute id+1 ≥ 1 — so a vocabulary hole changes
  * the checksum loudly instead of silently.
  *
  * Pure per-row scalar — no join, no aggregation. */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)],
    vocabIds: Map[String, Int])
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_ids", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false)))
  override protected def withNewChildInternal(c: Expression): BpeEncodeExpr =
    copy(child = c)
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_encode needs ARRAY<STRING>, got ${other.sql}")
    }

  @transient private lazy val mergeA: Array[String] = merges.map(_._1).toArray
  @transient private lazy val mergeB: Array[String] = merges.map(_._2).toArray
  @transient private lazy val mergeAB: Array[String] =
    BpeApplyExpr.mergedTable(mergeA, mergeB)
  @transient private lazy val ids: java.util.HashMap[String, java.lang.Integer] = {
    val m = new java.util.HashMap[String, java.lang.Integer](
      math.max(16, (vocabIds.size / 0.75).toInt + 1))
    vocabIds.foreach { case (s, i) => m.put(s, java.lang.Integer.valueOf(i)) }
    m
  }
  // reusable split scratch, THREAD-LOCAL: per-task plan deserialization
  // usually gives each task its own instance, but this expression is not
  // marked stateful, so a shared-instance evaluation path (driver-side
  // local eval of concurrent queries, subexpression reuse) is legal —
  // a plain var would race there and corrupt output. One TL.get per row
  // keeps the no-allocation win; grown geometrically on demand.
  @transient private lazy val scratchTL: ThreadLocal[Array[String]] =
    ThreadLocal.withInitial(() => new Array[String](64))

  /** Instance entry point shared by eval and codegen. */
  def encode(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    var n = 0L
    var h = BpeEncodeExpr.ChecksumOffset
    val nTok = arr.numElements()
    var scratch = scratchTL.get()
    var t = 0
    while (t < nTok) {
      val u = arr.getUTF8String(t)
      val w = if (u eq null) "" else u.toString // null token = no symbols
      if (w.nonEmpty) {
        if (scratch.length < w.length) {
          scratch = new Array[String](math.max(64, w.length * 2))
          scratchTL.set(scratch)
        }
        val k = BpeApplyExpr.splitSyms(w, scratch)
        val m = BpeApplyExpr.scanSyms(scratch, k, mergeA, mergeB, mergeAB)
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
    val ref = ctx.addReferenceObj("bpeEncode", this,
      classOf[BpeEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }
}

object BpeEncodeExpr {
  /** FNV-64 offset / prime as the sequence-checksum constants — the
    * CONTRACT both the engine and the witness fixture implement (the
    * mechanisms around it — tokenizer, merge apply, vocab build — stay
    * independent). An out-of-vocabulary symbol contributes 0. */
  val ChecksumOffset: Long = -3750763034362895579L // 0xcbf29ce484222325
  val ChecksumPrime: Long = 1099511628211L         // 0x100000001b3

  /** Driver-side checksum fold over an id sequence (the witness path). */
  def checksum(idSeq: IterableOnce[Int]): Long =
    idSeq.iterator.foldLeft(ChecksumOffset)(
      (h, id) => h * ChecksumPrime + (id + 1L))

  import org.apache.spark.sql.graftbridge.Bridge
  def of(tokens: Column, merges: Seq[(String, String)],
      vocabIds: Map[String, Int]): Column =
    Bridge.column(BpeEncodeExpr(Bridge.expression(tokens), merges, vocabIds))
}
