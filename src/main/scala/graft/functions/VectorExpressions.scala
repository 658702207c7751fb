package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** One-pass cosine kernel for embedding columns.
  *
  * The declarative form (`aggregate(zip_with(...))` × 3: dot, ‖a‖, ‖b‖)
  * walks both arrays three times through interpreted lambdas. This
  * kernel computes all three sums in a single traversal with the SAME
  * sequential fold order and double promotion per element, so scores are
  * bit-identical to the declarative form and to DuckDB's
  * `list_sum(list_transform(...))` (the cross-engine numeric contract).
  *
  * Length mismatch mirrors zip_with's null-padding → null sum → the
  * `when(d > 0, ...).otherwise(0.0)` fallthrough: result 0.0.
  */
case class CosineExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineExpr =
    copy(left = l, right = r)
  override def prettyName: String = "cosine"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val n = aa.numElements()
    if (bb.numElements() != n) return java.lang.Double.valueOf(0.0)
    val aF = elemIsFloat(left)
    val bF = elemIsFloat(right)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      // a null element nulls the declarative sums → d is null → the
      // when(d > 0) fallthrough yields 0.0; mirror that exactly
      if (aa.isNullAt(i) || bb.isNullAt(i)) return java.lang.Double.valueOf(0.0)
      val x = if (aF) aa.getFloat(i).toDouble else aa.getDouble(i)
      val y = if (bF) bb.getFloat(i).toDouble else bb.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    java.lang.Double.valueOf(if (d > 0) dot / d else 0.0)
  }
}

object VectorExpressions {
  import org.apache.spark.sql.graftbridge.Bridge

  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineExpr(Bridge.expression(a), Bridge.expression(b)))
}
