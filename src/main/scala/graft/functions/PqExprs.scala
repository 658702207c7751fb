package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType}

/** Product-quantization encode (Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search"): the vector is split
  * into `m` contiguous subvectors of dim/m and each subvector is
  * replaced by the id of its nearest codeword in that subspace's
  * codebook — `m` bytes per vector, the 100 TB corpus-copy layout
  * (dim 64 doubles = 512 B → 8 B at m=8). Per subspace: strict-less
  * argmin of the sequential squared-L2 fold (the exact
  * [[VectorKernels.nearestCentroid]] arithmetic on the slice), ties to
  * the smaller code. A null element or a length mismatch with the
  * codebook geometry yields the EMPTY codes array for the whole vector
  * — loud, never silently bucketed (the IvfAnn convention).
  *
  * One narrow per-row pass; the codebooks are model-sized expression
  * state (m × k × dim/m doubles, the capped-driver-state convention).
  *
  * Codes are stored as UNSIGNED bytes (read back with `& 0xFF`, so the
  * full production k = 256 fits — [[graft.operators.Pq.train]] bounds
  * k accordingly); the invalid marker is the EMPTY codes array (its
  * length can never equal m), not a sentinel value that a signed-byte
  * wraparound could alias. */
case class PqEncodeExpr(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
  override def prettyName: String = "pq_encode"

  @transient private lazy val cbs: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val code = VectorKernels.typeCode(child.dataType)

  def encode(a: ArrayData): ArrayData = {
    val m = cbs.length
    val dsub = cbs(0)(0).length
    if (a.numElements() != m * dsub)
      return new GenericArrayData(Array.emptyByteArray)
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val c = VectorKernels.pqNearestSub(a, code, s * dsub, cbs(s))
      // a null element invalidates the whole vector (pqNearestSub
      // returns −1 for the affected subspace) — emit the empty marker
      if (c < 0) return new GenericArrayData(Array.emptyByteArray)
      out(s) = c.toByte
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this,
      classOf[PqEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }
}

object PqEncodeExpr {
  import org.apache.spark.sql.graftbridge.Bridge
  def of(v: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqEncodeExpr(Bridge.expression(v), codebooks))
}

/** Asymmetric-distance (ADC) scoring against per-query lookup tables:
  * score(q, codes) = Σ_s table(q)(s)(codes(s)) where table(q)(s)(c) is
  * the squared L2 between query q's subvector s and codeword c —
  * computed ONCE per query on the driver (m × k doubles per query, a
  * bounded probe batch), so each (query, candidate) pair costs m table
  * lookups instead of a dim-length fold. This is the PQ probe shape:
  * the query stays full-precision, only the corpus side pays
  * quantization noise (the [[graft.operators.IvfAnn.quantized]]
  * asymmetry, taken to table-lookup form). Codes read back UNSIGNED
  * (`& 0xFF`, matching [[PqEncodeExpr]]'s layout). An invalid codes
  * array (length ≠ m — encode's empty marker) or an unknown query id
  * yields NULL; the top-k rankers order `asc_nulls_last`, so a NULL
  * score can never displace a real neighbor yet stays visible in any
  * full projection. */
case class PqAdcExpr(left: Expression, right: Expression,
    tables: Map[Long, Seq[Seq[Double]]])
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqAdcExpr = copy(left = l, right = r)

  @transient private lazy val tbl: java.util.HashMap[java.lang.Long, Array[Array[Double]]] = {
    val m = new java.util.HashMap[java.lang.Long, Array[Array[Double]]](
      math.max(16, (tables.size / 0.75).toInt + 1))
    tables.foreach { case (q, t) =>
      m.put(java.lang.Long.valueOf(q), t.map(_.toArray).toArray) }
    m
  }

  def score(qid: Long, codes: ArrayData): java.lang.Double = {
    val t = tbl.get(qid)
    if (t eq null) return null
    var acc = 0.0
    var s = 0
    val m = codes.numElements()
    if (m != t.length) return null
    while (s < m) {
      val c = codes.getByte(s) & 0xFF
      if (c >= t(s).length) return null
      acc += t(s)(c)
      s += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override def nullSafeEval(q: Any, codes: Any): Any =
    score(q.asInstanceOf[Long], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcExpr].getName)
    val tmp = ctx.freshName("adc")
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"""java.lang.Double $tmp = $ref.score($q, $c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin)
  }
}

object PqAdcExpr {
  import org.apache.spark.sql.graftbridge.Bridge
  def of(queryId: Column, codes: Column,
      tables: Map[Long, Seq[Seq[Double]]]): Column =
    Bridge.column(PqAdcExpr(Bridge.expression(queryId),
      Bridge.expression(codes), tables))
}
