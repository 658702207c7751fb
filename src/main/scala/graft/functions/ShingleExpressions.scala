package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native shingling + set-similarity kernels.
  *
  * The declarative formulations in TextFunctions build a doc-length array
  * through `transform(sequence(...), substr)` — every element is an
  * interpreted lambda step allocating a UTF8String — then `array_distinct`
  * walks it again. For a 2 kB document that is ~2 000 interpreter
  * round-trips per doc per stage. These kernels produce the identical
  * distinct shingle arrays in a single traversal with one hash-set;
  * [[JaccardExpr]] likewise folds `array_intersect` + `array_distinct
  * (concat)` into one set pass. Values are bit-identical to the
  * declarative forms (parity specs + oracle hash-matches pin this).
  */
object ShingleKernels {

  /** Distinct char n-grams, first-occurrence order — matches
    * `array_distinct(charNgrams(text, n))`: windows when the text has at
    * least n chars, else the whole text as the single shingle. */
  def charNgramsDistinct(text: UTF8String, n: Int): Array[UTF8String] = {
    val s = text.toString
    // Spark substr counts code points; ASCII texts (the common case) let
    // us window the Java string directly, otherwise fall back to the
    // code-point-aware UTF8String slicing.
    val cpCount = s.codePointCount(0, s.length)
    if (cpCount < n) return Array(text.clone())
    val seen = new java.util.LinkedHashSet[String](math.min(cpCount, 1 << 16))
    if (cpCount == s.length) {
      var i = 0
      while (i + n <= s.length) { seen.add(s.substring(i, i + n)); i += 1 }
    } else {
      var i = 1
      while (i + n - 1 <= cpCount) {
        seen.add(text.substringSQL(i, n).toString); i += 1
      }
    }
    val out = new Array[UTF8String](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    out
  }

  /** Distinct word n-gram shingles (space-joined), first-occurrence order
    * — matches `array_distinct(wordShingles(text, n))`: fewer than n
    * tokens collapse to one shingle of all tokens joined. */
  def wordShinglesDistinct(text: UTF8String, n: Int): Array[UTF8String] = {
    val toks = text.toString.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n)
      return Array(UTF8String.fromString(toks.mkString(" ")))
    val seen = new java.util.LinkedHashSet[String](toks.length)
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[UTF8String](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    out
  }

  // ArrayData-boxed entry points for generated code (and nullSafeEval)

  def charShinglesArray(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(charNgramsDistinct(text, n).asInstanceOf[Array[Any]])

  def wordShinglesArray(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(wordShinglesDistinct(text, n).asInstanceOf[Array[Any]])

  /** One set-pass Jaccard body, callable from generated code. */
  def jaccard(aa: ArrayData, bb: ArrayData): Double = {
    val setA = new java.util.HashSet[UTF8String](aa.numElements() * 2)
    var i = 0
    while (i < aa.numElements()) { setA.add(aa.getUTF8String(i)); i += 1 }
    val setB = new java.util.HashSet[UTF8String](bb.numElements() * 2)
    var inter = 0
    i = 0
    while (i < bb.numElements()) {
      val s = bb.getUTF8String(i)
      if (setB.add(s) && setA.contains(s)) inter += 1
      i += 1
    }
    val union = setA.size + setB.size - inter
    if (union > 0) inter.toDouble / union else 0.0
  }
}

/** Distinct char n-grams of a string column, one pass; real doGenCode
  * (static kernel call) keeps the enclosing stage in whole-stage codegen. */
case class CharShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def withNewChildInternal(c: Expression): CharShinglesExpr = copy(child = c)
  override def prettyName: String = "char_shingles"
  override def nullSafeEval(v: Any): Any =
    ShingleKernels.charShinglesArray(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernels$$.MODULE$$.charShinglesArray($c, $n);")
}

/** Distinct word n-gram shingles of a string column, one pass; real
  * doGenCode via static kernel call. */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def withNewChildInternal(c: Expression): WordShinglesExpr = copy(child = c)
  override def prettyName: String = "word_shingles"
  override def nullSafeEval(v: Any): Any =
    ShingleKernels.wordShinglesArray(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernels$$.MODULE$$.wordShinglesArray($c, $n);")
}

/** Exact Jaccard over two string arrays in one set pass — identical math
  * to `size(array_intersect(a,b)) / size(array_distinct(concat(a,b)))`
  * (both sides are deduped; empty union → 0.0). Real doGenCode. */
case class JaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardExpr =
    copy(left = l, right = r)
  override def prettyName: String = "jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(ShingleKernels.jaccard(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ShingleKernels$$.MODULE$$.jaccard($a, $b);")
}

object ShingleExpressions {
  import org.apache.spark.sql.graftbridge.Bridge

  def charShinglesDistinct(text: Column, n: Int): Column =
    Bridge.column(CharShinglesExpr(Bridge.expression(text), n))

  def wordShinglesDistinct(text: Column, n: Int): Column =
    Bridge.column(WordShinglesExpr(Bridge.expression(text), n))

  def jaccard(a: Column, b: Column): Column =
    Bridge.column(JaccardExpr(Bridge.expression(a), Bridge.expression(b)))
}
