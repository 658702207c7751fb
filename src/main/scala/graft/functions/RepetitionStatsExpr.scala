package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass repetition statistics: tokenize once, count distinct tokens
  * and word-2-gram occurrences in the same traversal, emit
  * (n_tokens, n_distinct, n_grams, top_n, n_distinct_grams).
  *
  * Value-identical to the declarative explode→count→max pipeline over
  * `TextFunctions.wordShingles(text, 2)` (q69's oracle re-derives that
  * formulation in SQL), including the degenerate branch: fewer than two
  * tokens yields ONE gram — the space-joined whole token list (the empty
  * string for an empty doc) — so n_grams=1, top_n=1.
  *
  * The per-doc gram map is bounded by document length — the same order
  * of memory the tokenizer's array already uses — where the
  * explode-based formulation pays two full scans of the corpus plus a
  * (doc, gram) shuffle. Measured: q69 at sf0.1 12.4 s → sub-second. */
case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_grams", IntegerType, nullable = false),
    StructField("top_n", LongType, nullable = false),
    StructField("n_distinct_grams", IntegerType, nullable = false)))

  override protected def withNewChildInternal(c: Expression): RepetitionStatsExpr = copy(c)
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(v: Any): Any =
    RepetitionStatsExpr.kernel(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionStatsExpr$$.MODULE$$.kernel($c);")
}

object RepetitionStatsExpr {

  private val ws = Pattern.compile("\\s+")

  def kernel(u: UTF8String): InternalRow = {
    val parts = ws.split(u.toString, -1)
    // non-empty tokens only (split("\\s+") of a leading-blank string
    // yields a leading empty part — TextFunctions.tokens drops it)
    var n = 0
    val toks = new Array[String](parts.length)
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) {
        toks(n) = parts(i)
        distinct.add(parts(i))
        n += 1
      }
      i += 1
    }
    var nGrams = 0
    var topN = 0L
    var nDistinctGrams = 0
    if (n >= 2) {
      nGrams = n - 1
      val counts = new java.util.HashMap[String, Long]()
      var j = 0
      while (j < n - 1) {
        val g = toks(j) + " " + toks(j + 1)
        val c = counts.merge(g, 1L, (a, b) => a + b)
        if (c > topN) topN = c
        j += 1
      }
      nDistinctGrams = counts.size()
    } else {
      // wordShingles' degenerate branch: one gram = join of all tokens
      nGrams = 1
      topN = 1L
      nDistinctGrams = 1
    }
    InternalRow(n, distinct.size, nGrams, topN, nDistinctGrams)
  }

  def of(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(RepetitionStatsExpr(Bridge.expression(text)))
  }
}
