package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Total bigram surprisal of a token array under a pre-trained capped
  * bigram model with unigram backoff — the executor-side probe behind
  * [[graft.operators.LmOps.bigramSurprisalGate]], the order-2 sibling
  * of [[VocabSurprisalSumExpr]].
  *
  * Per bigram position (prev, cur): the bigram table (keyed by the
  * two-token gram string `prev + " " + cur` — the same key shape
  * q133's model rows carry) wins; otherwise the unigram backoff bucket
  * of `cur` (whose values already include the 1-bit backoff penalty);
  * otherwise `oovSb`. Both tables materialize ONCE per expression
  * instance as `UTF8String`-keyed hash maps — O(1) per position, with
  * one small gram-key concat per probe (the same byte traffic the
  * row's shingle would cost; no O(vocab) scans anywhere).
  *
  * A pure per-row scalar: no join, no aggregation — legal in any
  * streaming position. */
case class BigramSurprisalSumExpr(child: Expression,
    bigramSb: Map[String, Long], uniSb: Map[String, Long], oovSb: Long)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override protected def withNewChildInternal(c: Expression): BigramSurprisalSumExpr =
    copy(child = c)
  override def prettyName: String = "bigram_surprisal_sum"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bigram_surprisal_sum needs ARRAY<STRING>, got ${other.sql}")
    }

  @transient private lazy val bigTable: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](
      math.max(16, (bigramSb.size / 0.75).toInt + 1))
    bigramSb.foreach { case (g, sb) =>
      m.put(UTF8String.fromString(g), java.lang.Long.valueOf(sb))
    }
    m
  }
  @transient private lazy val uniTable: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](
      math.max(16, (uniSb.size / 0.75).toInt + 1))
    uniSb.foreach { case (t, sb) =>
      m.put(UTF8String.fromString(t), java.lang.Long.valueOf(sb))
    }
    m
  }
  @transient private lazy val space = UTF8String.fromString(" ")

  /** Instance entry point shared by eval and codegen. */
  def sumOf(arr: ArrayData): Long = {
    var total = 0L
    val n = arr.numElements()
    var i = 1
    while (i < n) {
      val prev = arr.getUTF8String(i - 1)
      val cur = arr.getUTF8String(i)
      val big = bigTable.get(UTF8String.concat(prev, space, cur))
      total +=
        (if (big ne null) big.longValue()
         else {
           val uni = uniTable.get(cur)
           if (uni ne null) uni.longValue() else oovSb
         })
      i += 1
    }
    total
  }

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(sumOf(v.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramSurprisal", this,
      classOf[BigramSurprisalSumExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.sumOf($c);")
  }
}

object BigramSurprisalSumExpr {
  import org.apache.spark.sql.graftbridge.Bridge
  def of(tokens: Column, bigramSb: Map[String, Long], uniSb: Map[String, Long],
      oovSb: Long): Column =
    Bridge.column(BigramSurprisalSumExpr(Bridge.expression(tokens),
      bigramSb, uniSb, oovSb))
}
