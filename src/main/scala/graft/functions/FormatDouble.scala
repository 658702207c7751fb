package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Render a double with ≤15 significant digits and no trailing zeros —
  * the reference's number-to-string codec used by the multiply/add rule
  * transforms (reference: src/data_transformer.cpp:9-24,
  * `std::ostringstream << std::setprecision(15)` + trailing-zero strip).
  *
  * Spark's `format_number` forces a fixed decimal count, so this needs a
  * custom expression. Implemented as a native Catalyst `Expression`
  * (not a Scala UDF) with real `doGenCode`, so rule pipelines containing
  * it stay inside whole-stage codegen end-to-end.
  *
  * Divergence (documented, intentional): for values printed in scientific
  * notation the reference's zero-strip also eats trailing zeros of the
  * exponent ("1.5e+20" → "1.5e+2"); we strip only mantissa zeros.
  */
case class FormatDouble15(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override protected def withNewChildInternal(c: Expression): FormatDouble15 = copy(c)

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(FormatDouble15.format(v.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.FormatDouble15$$.MODULE$$.format($c));""".stripMargin)

  override def prettyName: String = "format_double15"
}

object FormatDouble15 {

  /** %.15g-style rendering then strip trailing fraction zeros. */
  def format(v: Double): String = {
    if (v.isNaN) return "nan"
    if (v.isInfinite) return if (v > 0) "inf" else "-inf"
    var s = String.format(java.util.Locale.ROOT, "%.15g", Double.box(v))
    val e = s.indexWhere(c => c == 'e' || c == 'E')
    val (mantissa, exponent) = if (e >= 0) (s.substring(0, e), s.substring(e)) else (s, "")
    var m = mantissa
    if (m.contains('.')) {
      m = m.reverse.dropWhile(_ == '0').reverse
      if (m.endsWith(".")) m = m.dropRight(1)
    }
    s = m + exponent
    s
  }

  /** Expose as a Column function (input is cast to double). */
  def of(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(FormatDouble15(Bridge.expression(c.cast(DoubleType))))
  }
}
