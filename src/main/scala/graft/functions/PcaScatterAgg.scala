package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The PCA moment pass as ONE mergeable aggregate — the whole integer
  * scatter state ([[graft.operators.Pca]]) off a single corpus
  * aggregation: n, invalid-row count, max |q|, and the EXACT integer
  * sums s_i = Σ q_i and S_ij = Σ q_i·q_j over the upper triangle.
  *
  * Round 19: this replaces the posexplode form, which materialized
  * dim(dim+1)/2 rows PER VECTOR (2,080 at dim 64 — ~100M shuffled-
  * aggregation rows per corpus pass at sf0.1) across three separate
  * jobs (triangle cells, column sums, count/qmax/invalid stats). The
  * products are now accumulated row-locally into a fixed O(dim²)
  * buffer that combines map-side; the exchange carries one buffer per
  * partition and the driver reads one row.
  *
  * Exactness: cells accumulate in SIGNED 128-BIT integer arithmetic
  * (hi/lo long pairs, carry-propagated) — the momentCells regime
  * scales q to 2^30 per element, so a single product reaches 2^60 and
  * any corpus overflows int64 sums; products are computed full-width
  * (Math.multiplyHigh) and 128 bits hold Σ q_i·q_j for n·qmax² < 2^126,
  * beyond any feasible corpus — no overflow surface at all, so the
  * callers' exactness requires stay the only failure mode. The
  * evaluated cells are DECIMAL(38,0) — bit-identical to the exact
  * decimal sums of the explode form (both are exact integer sums;
  * addition is associative and commutative, so partial-merge order
  * cannot show).
  *
  * Invalid rows (null array, wrong dimension vs the first-seen one,
  * null element) are COUNTED, not dropped silently — the callers
  * require(invalid == 0), same contract as the old stats pass. Merging
  * states with CONFLICTING dimensions throws: a mixed-dimension corpus
  * is unconditionally an error, and which row counts as "invalid" would
  * otherwise depend on partitioning. */
final case class PcaScatterAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PcaScatterState] {

  override def children: Seq[Expression] = child :: Nil
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> (the quantized vector), got $other")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = PcaScatterAgg.ResultType
  override def prettyName: String = "pca_scatter"

  override def createAggregationBuffer(): PcaScatterState =
    new PcaScatterState()

  override def update(buffer: PcaScatterState,
      input: InternalRow): PcaScatterState = {
    val v = child.eval(input)
    if (v == null) buffer.invalid += 1
    else buffer.observe(v.asInstanceOf[ArrayData])
    buffer
  }

  override def merge(buffer: PcaScatterState,
      other: PcaScatterState): PcaScatterState = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: PcaScatterState): Any = {
    def dec(hi: Long, lo: Long): Decimal = {
      val big = (BigInt(hi) << 64) +
        BigInt(java.lang.Long.toUnsignedString(lo))
      Decimal(BigDecimal(big), 38, 0)
    }
    val dim = math.max(buffer.dim, 0)
    val s = new Array[Any](dim)
    val tri = new Array[Any](dim * (dim + 1) / 2)
    var i = 0
    while (i < dim) { s(i) = dec(buffer.sHi(i), buffer.sLo(i)); i += 1 }
    var k = 0
    while (k < tri.length) {
      tri(k) = dec(buffer.triHi(k), buffer.triLo(k)); k += 1
    }
    InternalRow(buffer.n, buffer.invalid, buffer.qmax, buffer.dim,
      new GenericArrayData(s), new GenericArrayData(tri))
  }

  override def serialize(buffer: PcaScatterState): Array[Byte] =
    buffer.toBytes

  override def deserialize(bytes: Array[Byte]): PcaScatterState =
    PcaScatterState.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): PcaScatterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PcaScatterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PcaScatterAgg =
    copy(child = newChildren(0))
}

object PcaScatterAgg {
  val ResultType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("invalid", LongType, nullable = false),
    StructField("qmax", LongType, nullable = false),
    StructField("dim", IntegerType, nullable = false),
    StructField("s", ArrayType(DecimalType(38, 0), containsNull = false)),
    StructField("tri", ArrayType(DecimalType(38, 0), containsNull = false))))

  /** The scatter state as a Column aggregate: one
    * struct<n, invalid, qmax, dim, s, tri> row. */
  def of(qa: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(
      PcaScatterAgg(Bridge.expression(qa)).toAggregateExpression())
  }
}

/** O(dim²) accumulation state: 128-bit signed cells as (hi, lo) long
  * pairs, lo unsigned. `dim == -1` until the first non-null vector. */
final class PcaScatterState {
  var dim: Int = -1
  var n: Long = 0L
  var invalid: Long = 0L
  var qmax: Long = 0L
  var sHi: Array[Long] = null
  var sLo: Array[Long] = null
  var triHi: Array[Long] = null
  var triLo: Array[Long] = null

  private def init(d: Int): Unit = {
    dim = d
    sHi = new Array[Long](d); sLo = new Array[Long](d)
    val t = d * (d + 1) / 2
    triHi = new Array[Long](t); triLo = new Array[Long](t)
  }

  /** hi:lo += (phi:plo), both signed 128-bit with unsigned low words. */
  @inline private def add128(hi: Array[Long], lo: Array[Long], k: Int,
      phi: Long, plo: Long): Unit = {
    val l = lo(k)
    val nl = l + plo
    // unsigned carry out of the low word
    val carry = ((l & plo) | ((l | plo) & ~nl)) >>> 63
    lo(k) = nl
    hi(k) = hi(k) + phi + carry
  }

  def observe(arr: ArrayData): Unit = {
    val sz = arr.numElements()
    if (dim == -1) init(sz)
    if (sz != dim) { invalid += 1; return }
    var i = 0
    while (i < sz) {
      if (arr.isNullAt(i)) { invalid += 1; return }
      i += 1
    }
    n += 1
    i = 0
    var k = 0
    while (i < dim) {
      val qi = arr.getLong(i)
      val a = math.abs(qi)
      if (a > qmax) qmax = a
      add128(sHi, sLo, i, qi >> 63, qi)
      var j = i
      while (j < dim) {
        // full 128-bit product: exact for ANY long q, so the callers'
        // exactness requires (not a task-side ArithmeticException)
        // stay the failure surface in the beyond-guard regime
        val qj = arr.getLong(j)
        add128(triHi, triLo, k, Math.multiplyHigh(qi, qj), qi * qj)
        k += 1
        j += 1
      }
      i += 1
    }
  }

  def mergeIn(other: PcaScatterState): Unit = {
    invalid += other.invalid
    if (other.dim == -1) return
    if (dim == -1) {
      dim = other.dim
      n = other.n
      qmax = math.max(qmax, other.qmax)
      sHi = other.sHi; sLo = other.sLo
      triHi = other.triHi; triLo = other.triLo
      return
    }
    if (other.dim != dim)
      throw new IllegalStateException(
        s"PCA corpus mixes vector dimensions ($dim vs ${other.dim}) — " +
          "clean before PCA")
    n += other.n
    if (other.qmax > qmax) qmax = other.qmax
    var i = 0
    while (i < dim) {
      // 128-bit add of the other state's (hi, lo) cell
      val l = sLo(i); val ol = other.sLo(i)
      val nl = l + ol
      val carry = ((l & ol) | ((l | ol) & ~nl)) >>> 63
      sLo(i) = nl
      sHi(i) = sHi(i) + other.sHi(i) + carry
      i += 1
    }
    var k = 0
    while (k < triHi.length) {
      val l = triLo(k); val ol = other.triLo(k)
      val nl = l + ol
      val carry = ((l & ol) | ((l | ol) & ~nl)) >>> 63
      triLo(k) = nl
      triHi(k) = triHi(k) + other.triHi(k) + carry
      k += 1
    }
  }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(dim); out.writeLong(n); out.writeLong(invalid)
    out.writeLong(qmax)
    if (dim >= 0) {
      var i = 0
      while (i < dim) { out.writeLong(sHi(i)); out.writeLong(sLo(i)); i += 1 }
      var k = 0
      while (k < triHi.length) {
        out.writeLong(triHi(k)); out.writeLong(triLo(k)); k += 1
      }
    }
    out.flush(); bos.toByteArray
  }
}

object PcaScatterState {
  def fromBytes(bytes: Array[Byte]): PcaScatterState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new PcaScatterState()
    val d = in.readInt()
    st.n = in.readLong(); st.invalid = in.readLong(); st.qmax = in.readLong()
    if (d >= 0) {
      st.dim = d
      st.sHi = new Array[Long](d); st.sLo = new Array[Long](d)
      val t = d * (d + 1) / 2
      st.triHi = new Array[Long](t); st.triLo = new Array[Long](t)
      var i = 0
      while (i < d) { st.sHi(i) = in.readLong(); st.sLo(i) = in.readLong(); i += 1 }
      var k = 0
      while (k < t) { st.triHi(k) = in.readLong(); st.triLo(k) = in.readLong(); k += 1 }
    } else st.dim = d
    st
  }
}
