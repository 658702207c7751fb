package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Min-K% Prob membership probe (Shi et al. 2023, "Detecting
  * Pretraining Data from Large Language Models"): the sum of the
  * ⌈pctMilli·nb / 1000⌉ LARGEST per-position surprisals of a token
  * array under the fixed q133 bigram model (bigram bucket, unigram
  * backoff, OOV worst case — the [[BigramSurprisalSumExpr]] tables).
  *
  * The published detector flags a document as a TRAINING MEMBER when
  * the mean log-likelihood of its k% least-probable tokens is high —
  * in this repo's integer surprisal units: when the mean of the top-k
  * surprisal buckets is LOW. This expression returns the top-k SUM;
  * the caller derives k from the token count with the same ceiling
  * formula (k is a pure function of size(tokens), so the flag is a
  * plain column comparison: sum·1000 ≤ thresh·k).
  *
  * Per row: one table probe per position (O(1) hash lookups, the
  * BigramSurprisalSumExpr discipline), then an O(nb log nb) sort of
  * the row-local surprisal buffer — document-bounded memory, no join,
  * no aggregation, legal in any streaming position. The top-k sum is
  * tie-insensitive (the sum of the k largest values of a multiset is
  * unique no matter how equal values are ordered), which is what lets
  * the q210 oracle re-derive it with a cumulative-count clip in SQL. */
case class MinKSurprisalExpr(child: Expression,
    bigramSb: Map[String, Long], uniSb: Map[String, Long], oovSb: Long,
    pctMilli: Long)
  extends UnaryExpression {

  require(pctMilli >= 1 && pctMilli <= 1000,
    s"pctMilli must sit in [1, 1000], got $pctMilli")

  override def dataType: DataType = LongType
  override protected def withNewChildInternal(c: Expression): MinKSurprisalExpr =
    copy(child = c)
  override def prettyName: String = "mink_surprisal_sum"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mink_surprisal_sum needs ARRAY<STRING>, got ${other.sql}")
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
  def topSumOf(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n < 2) return 0L
    val nb = n - 1
    val buf = new Array[Long](nb)
    var i = 1
    while (i < n) {
      val prev = arr.getUTF8String(i - 1)
      val cur = arr.getUTF8String(i)
      val big = bigTable.get(UTF8String.concat(prev, space, cur))
      buf(i - 1) =
        (if (big ne null) big.longValue()
         else {
           val uni = uniTable.get(cur)
           if (uni ne null) uni.longValue() else oovSb
         })
      i += 1
    }
    java.util.Arrays.sort(buf)
    val k = MinKSurprisalExpr.kOf(nb.toLong, pctMilli).toInt
    var total = 0L
    var j = nb - k
    while (j < nb) { total += buf(j); j += 1 }
    total
  }

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(topSumOf(v.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minkSurprisal", this,
      classOf[MinKSurprisalExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.topSumOf($c);")
  }
}

object MinKSurprisalExpr {
  import org.apache.spark.sql.graftbridge.Bridge

  /** k = ⌈pctMilli·nb / 1000⌉ — the ONE ceiling formula shared by the
    * expression, the column derivation in LmOps.minkScores, and the
    * q210 oracle (1 ≤ k ≤ nb for nb ≥ 1 and 1 ≤ pctMilli ≤ 1000). */
  def kOf(nb: Long, pctMilli: Long): Long =
    if (nb <= 0) 0L else (pctMilli * nb + 999L) / 1000L

  def of(tokens: Column, bigramSb: Map[String, Long],
      uniSb: Map[String, Long], oovSb: Long, pctMilli: Long): Column =
    Bridge.column(MinKSurprisalExpr(Bridge.expression(tokens),
      bigramSb, uniSb, oovSb, pctMilli))
}
