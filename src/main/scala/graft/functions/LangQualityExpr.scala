package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass language-ID + quality-score kernel.
  *
  * The declarative pair ([[TextFunctions.langIdHeuristic]] +
  * [[TextFunctions.qualityScore]]) tokenizes the document repeatedly and
  * runs six interpreted `filter` lambdas (5 stopword lists + punct
  * regex). This kernel tokenizes once, counts stopword hits for all
  * languages and punctuation in the same traversal, and reproduces the
  * EXACT double arithmetic of the declarative formulation (same op
  * order, same tie-breaking), so q26's oracle hash is unchanged.
  */
case class LangQualityExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("quality", DoubleType, nullable = false)))
  override protected def withNewChildInternal(c: Expression): LangQualityExpr = copy(c)
  override def prettyName: String = "lang_quality"

  override def nullSafeEval(v: Any): Any =
    LangQualityExpr.kernel(v.asInstanceOf[UTF8String])

  /** Real codegen (not CodegenFallback): a static kernel call keeps the
    * surrounding stage in whole-stage codegen without the interpreted
    * eval() + references[] roundtrip per row. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LangQualityExpr$$.MODULE$$.kernel($c);")
}

object LangQualityExpr {

  /** One-pass kernel body, callable from generated code. */
  def kernel(u: UTF8String): InternalRow = {
    val text = u.toString
    val toks = text.split("\\s+", -1)
    // stopword hits per language (ascending lang order, precomputed sets)
    val hits = new Array[Int](LangQualityExpr.Langs.length)
    var nTok = 0
    var ti = 0
    while (ti < toks.length) {
      val t = toks(ti)
      if (t.nonEmpty) {
        nTok += 1
        var li = 0
        while (li < LangQualityExpr.Langs.length) {
          if (LangQualityExpr.Sets(li).contains(t)) hits(li) += 1
          li += 1
        }
      }
      ti += 1
    }
    var best = 0
    var li = 0
    while (li < hits.length) { if (hits(li) > best) best = hits(li); li += 1 }
    var lang = "und"
    if (best > 0) {
      li = 0
      var found = false
      while (li < hits.length && !found) {
        if (hits(li) == best) { lang = LangQualityExpr.Langs(li); found = true }
        li += 1
      }
    }
    // length + punctuation in one char scan (punct set is ASCII, so
    // UTF-16 iteration is safe; length counts code points like Spark's
    // length())
    val nChars = text.codePointCount(0, text.length)
    var punct = 0
    var ci = 0
    while (ci < text.length) {
      if (LangQualityExpr.Punct.get(text.charAt(ci))) punct += 1
      ci += 1
    }
    // identical double op order to the declarative formulation
    val nTokD = nTok.toDouble
    val lenScore = math.min(nTokD / 50.0, 1.0)
    val punctRatio = if (nChars > 0) punct.toDouble / nChars.toDouble else 0.0
    val enHits = hits(LangQualityExpr.EnIndex).toDouble
    val stopRatio = if (nTokD > 0) enHits / nTokD else 0.0
    val quality = lenScore * 0.4 +
      (1.0 - math.min(punctRatio * 5.0, 1.0)) * 0.3 +
      math.min(stopRatio * 5.0, 1.0) * 0.3
    InternalRow(UTF8String.fromString(lang), quality)
  }

  private val Sorted = TextFunctions.StopwordLists.sortBy(_._1)
  val Langs: Array[String] = Sorted.map(_._1).toArray
  val Sets: Array[java.util.HashSet[String]] = Sorted.map { case (_, ws) =>
    val s = new java.util.HashSet[String](ws.size * 2)
    ws.foreach(s.add)
    s
  }.toArray
  val EnIndex: Int = Langs.indexOf("en")
  val Punct: java.util.BitSet = {
    val b = new java.util.BitSet(128)
    ".,;:!?'\"()[]{}".foreach(c => b.set(c.toInt))
    b
  }

  import org.apache.spark.sql.graftbridge.Bridge
  /** struct(lang, quality) in one pass. */
  def of(text: Column): Column =
    Bridge.column(LangQualityExpr(Bridge.expression(text)))
}
