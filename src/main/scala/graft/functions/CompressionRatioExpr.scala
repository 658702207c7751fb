package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio of the UTF-8 text, in permille of the
  * original byte length — the classic redundancy quality signal
  * (boilerplate, repeated spans, and template spam compress far below
  * natural prose; the Gopher/CCNet filter family thresholds on exactly
  * this). Complements [[RepetitionStatsExpr]]: token/2-gram repetition
  * sees exact re-occurrence, deflate sees ANY byte-level redundancy
  * including near-repeats and long-range copies within the doc.
  *
  * Deterministic for a fixed JVM (java.util.zip bundles its zlib), but
  * NOT cross-engine reproducible — DuckDB has no deflate — so this
  * registers as a rows-only query, spec-verified, never hash-compared.
  * Per-row cost is one deflate pass over the doc; the Deflater is
  * thread-cached (native resource — allocating one per row would churn
  * finalizers at corpus scale).
  */
case class CompressionRatioExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override protected def withNewChildInternal(c: Expression): CompressionRatioExpr =
    copy(c)
  override def prettyName: String = "compression_permille"

  override def nullSafeEval(v: Any): Any =
    Integer.valueOf(CompressionRatioExpr.permille(v.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CompressionRatioExpr$$.MODULE$$.permille($c);")
}

object CompressionRatioExpr {

  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
  }

  /** deflated_bytes * 1000 div original_bytes; empty text → 0. */
  def permille(text: UTF8String): Int = {
    val bytes = text.getBytes
    if (bytes.isEmpty) return 0
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var compressed = 0L
    while (!d.finished()) compressed += d.deflate(buf)
    ((compressed * 1000L) / bytes.length).toInt
  }

  import org.apache.spark.sql.graftbridge.Bridge
  def of(text: Column): Column =
    Bridge.column(CompressionRatioExpr(Bridge.expression(text)))
}
