package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token statistics: tokenize once, emit
  * (n_tokens, content_fp, bag_fp) — value-identical to the declarative
  * `TextFunctions.tokenCount/contentFingerprint/bagFingerprint` trio
  * (pinned by oracle q25), but a single traversal instead of four
  * interpreted HOF passes + three regex evaluations per document.
  *
  * Parity notes (each deliberately mirrors the Spark builtin semantics):
  *   - tokens: Java regex `\s+` split with limit -1, empties dropped —
  *     identical to `filter(split(text, "\\s+"), _ != "")`;
  *   - content_fp: md5 of `\s+`→" " on the ROOT-locale lowercase (Spark's
  *     `lower` is locale-independent; Java's default-locale toLowerCase
  *     would diverge on e.g. Turkish dotted-I);
  *   - bag_fp: sorted distinct tokens by UTF-8 binary order (Spark's
  *     array_sort on strings), space-joined, md5'd.
  */
case class TokenStatsExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("content_fp", StringType, nullable = false),
    StructField("bag_fp", StringType, nullable = false)))

  override protected def withNewChildInternal(c: Expression): TokenStatsExpr = copy(c)
  override def prettyName: String = "token_stats"

  override def nullSafeEval(v: Any): Any =
    TokenStatsExpr.kernel(v.asInstanceOf[UTF8String])

  /** Real codegen: static kernel call, no interpreted-eval roundtrip. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenStatsExpr$$.MODULE$$.kernel($c);")
}

object TokenStatsExpr {

  private val ws = Pattern.compile("\\s+")

  /** One-pass kernel body, callable from generated code. */
  def kernel(u: UTF8String): InternalRow = {
    val text = u.toString
    val md = MessageDigest.getInstance("MD5")

    val parts = ws.split(text, -1)
    var n = 0
    val distinct = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) {
        n += 1
        distinct.add(UTF8String.fromString(parts(i))) // binary-ordered set
      }
      i += 1
    }

    val normalized = ws.matcher(text.toLowerCase(java.util.Locale.ROOT))
      .replaceAll(" ")
    val contentFp = HashKernels.toHex(
      HashKernels.md5(md, normalized.getBytes(StandardCharsets.UTF_8)))

    val bag = new StringBuilder
    val it = distinct.iterator()
    var first = true
    while (it.hasNext) {
      if (!first) bag.append(' ')
      bag.append(it.next().toString)
      first = false
    }
    val bagFp = HashKernels.toHex(
      HashKernels.md5(md, bag.toString.getBytes(StandardCharsets.UTF_8)))

    InternalRow(n, UTF8String.fromString(contentFp), UTF8String.fromString(bagFp))
  }

  def of(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(TokenStatsExpr(Bridge.expression(text)))
  }
}
