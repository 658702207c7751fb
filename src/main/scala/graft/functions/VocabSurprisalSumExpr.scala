package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Total surprisal of a token array under a pre-trained vocabulary —
  * the executor-side probe behind [[graft.operators.LmOps.surprisalGate]].
  *
  * The vocabulary ships with the expression (the CCNet deployment
  * shape: LM trained offline, filter inline) and is materialized ONCE
  * per expression instance as a `java.util.HashMap` keyed by
  * `UTF8String` — tokens are probed as the raw `UTF8String`s the row
  * holds, no per-token `String` decode, O(1) per lookup. The previous
  * form, `aggregate(ts, element_at(typedlit(vocab), t))`, scanned the
  * literal map PER TOKEN — O(vocab) each, invisible at a 16-entry spec
  * vocab but a 50,000-comparison-per-token cliff at a real CCNet-sized
  * vocabulary, exactly where the gate must be a cheap per-row
  * predicate. LmOpsSpec's 50k-vocab law pins the flat cost; the q127
  * batch-parity and streaming-append pins cover semantics.
  *
  * Still a pure per-row scalar (no join, no aggregation), so the gate
  * remains legal in any streaming position. */
case class VocabSurprisalSumExpr(child: Expression,
    vocabSb: Map[String, Long], oovSb: Long)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override protected def withNewChildInternal(c: Expression): VocabSurprisalSumExpr =
    copy(child = c)
  override def prettyName: String = "vocab_surprisal_sum"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vocab_surprisal_sum needs ARRAY<STRING>, got ${other.sql}")
    }

  // Built once per (deserialized) expression instance, shared across
  // every row the task scores; UTF8String keys make the probe
  // allocation-free on the hot path.
  @transient private lazy val table: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](
      math.max(16, (vocabSb.size / 0.75).toInt + 1))
    vocabSb.foreach { case (t, sb) =>
      m.put(UTF8String.fromString(t), java.lang.Long.valueOf(sb))
    }
    m
  }

  /** Instance entry point shared by eval and codegen. */
  def sumOf(arr: ArrayData): Long = {
    var total = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val sb = table.get(arr.getUTF8String(i))
      total += (if (sb eq null) oovSb else sb.longValue())
      i += 1
    }
    total
  }

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(sumOf(v.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabSurprisal", this,
      classOf[VocabSurprisalSumExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.sumOf($c);")
  }
}

object VocabSurprisalSumExpr {
  import org.apache.spark.sql.graftbridge.Bridge
  def of(tokens: Column, vocabSb: Map[String, Long], oovSb: Long): Column =
    Bridge.column(VocabSurprisalSumExpr(Bridge.expression(tokens), vocabSb, oovSb))
}
