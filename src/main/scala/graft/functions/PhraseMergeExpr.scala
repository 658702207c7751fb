package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word2vec phrase-merge statistics over a token array under a
  * fixed phrase table (the q208 model): emits
  * (n_matches, n_merges) where
  *
  *   - n_matches counts every position i with (t_i, t_{i+1}) in the
  *     table — match positions are judged on the ORIGINAL tokens (the
  *     single-pass word2vec convention: merged output is not
  *     re-considered as a left constituent);
  *   - n_merges counts the GREEDY LEFT-TO-RIGHT NON-OVERLAPPING
  *     selection of those matches: on a match at i both tokens are
  *     consumed and scanning resumes at i+2.
  *
  * The greedy count has a closed declarative form — within each maximal
  * run of L consecutive matching positions greedy selects ⌈L/2⌉ (enter
  * the run at its head, take every other position) — which is what the
  * q209 oracle computes with gaps-and-islands SQL and what
  * [[graft.operators.LmOps.phraseMergeRunsForm]] re-derives in Spark;
  * LmOpsSpec pins scan == runs-form on adversarial overlap chains.
  *
  * The table materializes once per expression instance as a
  * `UTF8String`-keyed hash set probed with one small gram-key concat
  * per position (the [[BigramSurprisalSumExpr]] discipline) — O(doc)
  * per row, no join, no aggregation: legal in any streaming position. */
case class PhraseMergeExpr(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_matches", LongType, nullable = false),
    StructField("n_merges", LongType, nullable = false)))

  override protected def withNewChildInternal(c: Expression): PhraseMergeExpr =
    copy(child = c)
  override def prettyName: String = "phrase_merge_stats"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"phrase_merge_stats needs ARRAY<STRING>, got ${other.sql}")
    }

  @transient private lazy val table: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](
      math.max(16, (phrases.size / 0.75).toInt + 1))
    phrases.foreach(p => s.add(UTF8String.fromString(p)))
    s
  }
  @transient private lazy val space = UTF8String.fromString(" ")

  /** Instance entry point shared by eval and codegen. */
  def statsOf(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var matches = 0L
    var i = 0
    while (i < n - 1) {
      if (table.contains(UTF8String.concat(
          arr.getUTF8String(i), space, arr.getUTF8String(i + 1))))
        matches += 1L
      i += 1
    }
    var merges = 0L
    i = 0
    while (i < n - 1) {
      if (table.contains(UTF8String.concat(
          arr.getUTF8String(i), space, arr.getUTF8String(i + 1)))) {
        merges += 1L
        i += 2
      } else i += 1
    }
    InternalRow(matches, merges)
  }

  override def nullSafeEval(v: Any): Any = statsOf(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phraseMergeExpr", this,
      classOf[PhraseMergeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.statsOf($c);")
  }
}

object PhraseMergeExpr {
  def of(tokens: Column, phrases: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(PhraseMergeExpr(Bridge.expression(tokens), phrases))
  }
}
