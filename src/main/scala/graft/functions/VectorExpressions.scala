package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

/** One-pass L2 normalization kernel: norm fold + per-element divide in a
  * single traversal. Value-identical to the declarative
  * `when(l2Norm(v) > 0, transform(v, x / n)).otherwise(zeros)` pair
  * (same fold order, same double promotion — pinned by the q60 oracle
  * and the PropertySpec parity case): the zero vector maps to zeros, and
  * a NULL element anywhere nulls the norm, which the declarative
  * `when` routes to the zeros branch — mirrored exactly. */
case class NormalizeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def withNewChildInternal(c: Expression): NormalizeExpr = copy(c)
  override def prettyName: String = "l2_normalize"

  private def getter: (ArrayData, Int) => Double =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType   => (a, i) => a.getFloat(i).toDouble
      case DoubleType  => (a, i) => a.getDouble(i)
      case IntegerType => (a, i) => a.getInt(i).toDouble
      case LongType    => (a, i) => a.getLong(i).toDouble
      case ShortType   => (a, i) => a.getShort(i).toDouble
      case ByteType    => (a, i) => a.getByte(i).toDouble
      case dt => throw new IllegalArgumentException(
        s"l2_normalize: unsupported array element type $dt")
    }

  @transient private lazy val get = getter

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val vals = new Array[Double](n)
    var ss = 0.0
    var anyNull = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) { anyNull = true; i = n }
      else {
        val x = get(arr, i)
        vals(i) = x
        ss += x * x
        i += 1
      }
    }
    val out = new Array[Any](n)
    val nrm = math.sqrt(ss)
    if (anyNull || !(nrm > 0)) {
      java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]], java.lang.Double.valueOf(0.0))
    } else {
      var j = 0
      while (j < n) { out(j) = java.lang.Double.valueOf(vals(j) / nrm); j += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object VectorExpressions {
  import org.apache.spark.sql.graftbridge.Bridge

  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineExpr(Bridge.expression(a), Bridge.expression(b)))

  def normalize(a: Column): Column =
    Bridge.column(NormalizeExpr(Bridge.expression(a)))
}
