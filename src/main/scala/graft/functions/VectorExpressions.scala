package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, IntegerType, LongType, ShortType}

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

  /** Element getter dispatched on the static element type — any numeric
    * array works (the declarative predecessor accepted them via
    * cast("double"); an int vector must not throw here). */
  private def getter(e: Expression): (ArrayData, Int) => Double =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType   => (a, i) => a.getFloat(i).toDouble
      case DoubleType  => (a, i) => a.getDouble(i)
      case IntegerType => (a, i) => a.getInt(i).toDouble
      case LongType    => (a, i) => a.getLong(i).toDouble
      case ShortType   => (a, i) => a.getShort(i).toDouble
      case ByteType    => (a, i) => a.getByte(i).toDouble
      case dt => throw new IllegalArgumentException(
        s"cosine: unsupported array element type $dt")
    }

  @transient private lazy val getA = getter(left)
  @transient private lazy val getB = getter(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val n = aa.numElements()
    if (bb.numElements() != n) return java.lang.Double.valueOf(0.0)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      // a null element nulls the declarative sums → d is null → the
      // when(d > 0) fallthrough yields 0.0; mirror that exactly
      if (aa.isNullAt(i) || bb.isNullAt(i)) return java.lang.Double.valueOf(0.0)
      val x = getA(aa, i)
      val y = getB(bb, i)
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
