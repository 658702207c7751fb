package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** The deterministic k-means++ selection CONTRACT (Arthur & Vassilvitskii
  * 2007, derandomized): centroid r+1 is the vector minimizing
  *
  *   key(id, r, dmin) = −ln(u(id, r)) / dmin
  *
  * over the corpus, where dmin is the vector's min squared-L2 to the
  * r centroids already chosen and u(id, r) is a splitmix64-derived
  * uniform in (0, 1]. key is an Exponential(rate = dmin) sample under
  * the hash's uniformity, and the min of independent exponentials lands
  * on i with probability dmin_i / Σ dmin — EXACTLY the k-means++ D²
  * distribution, evaluated as one TakeOrdered top-1 pass per pick (the
  * same job shape as the greedy farthest-point init it replaces, which
  * bought determinism at the price of outlier-seeking seeds).
  *
  * Like [[BpeEncodeExpr.checksum]], this object IS the shared contract
  * between the distributed trainer and the sequential witness — both
  * call these folds; the mechanisms around them (TakeOrdered scan vs
  * driver loop) stay independent. [[StrictMath]] (not Math) so the
  * double is bitwise identical on every JVM/platform — Math.log may be
  * intrinsified differently per CPU, and the oracle compare is exact.
  *
  * A non-positive dmin (duplicate of a chosen centroid) keys to +∞ —
  * never picked while any distinct vector remains; invalid vectors
  * cannot reach the pick (the corpus is validated up front). */
object KppInit {
  /** Fixed stream seed — part of the contract, like ChecksumPrime. */
  val Seed: Long = 0x6772616674AB12CDL

  private val TwoNeg53: Double = java.lang.Math.scalb(1.0, -53)

  /** splitmix64 finalizer — the standard constants. */
  def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic uniform in (0, 1]: 53 hash bits scaled; the one
    * all-zero bucket maps to 2⁻⁵³ so ln(u) stays finite. */
  def u(id: Long, round: Int): Double = {
    val z = mix(mix(id ^ Seed) ^ round.toLong) >>> 11
    if (z == 0L) TwoNeg53 else z * TwoNeg53
  }

  /** The selection key — argmin over the corpus picks centroid round+1. */
  def key(id: Long, round: Int, dmin: Double): Double =
    if (dmin > 0.0) -StrictMath.log(u(id, round)) / dmin
    else Double.PositiveInfinity

  /** Derandomized uniform SAMPLE key, per stream: ordering a corpus by
    * (sampleKey(id, stream), id) ascending and taking the first k is a
    * deterministic k-sample of that stream — the PQ codebook init
    * (FAISS-style random init derandomized; k-means++ picks would cost
    * k sequential barriers PER SUBSPACE, a nonstarter at k = 256).
    * Each subspace gets its own stream so codebooks don't correlate. */
  def sampleKey(id: Long, stream: Int): Long =
    mix(mix(id ^ Seed) + (stream + 1L) * 0x9E3779B97F4A7C15L)

  import org.apache.spark.sql.graftbridge.Bridge
  def keyCol(id: Column, round: Int, dmin: Column): Column =
    Bridge.column(KppKeyExpr(Bridge.expression(id),
      Bridge.expression(dmin), round))

  def sampleKeyCol(id: Column, stream: Column): Column =
    Bridge.column(SampleKeyExpr(Bridge.expression(id),
      Bridge.expression(stream)))
}

/** [[KppInit.key]] as a native expression: (id: BIGINT, dmin: DOUBLE) →
  * DOUBLE with the pick round baked in — a pure per-row scalar, so each
  * k-means++ pick stays one shuffle-free narrow pass + TakeOrdered. */
case class KppKeyExpr(left: Expression, right: Expression, round: Int)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "kpp_key"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KppKeyExpr = copy(left = l, right = r)

  override def nullSafeEval(id: Any, dmin: Any): Any =
    KppInit.key(id.asInstanceOf[Long], round, dmin.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (idc, dc) =>
      s"${ev.value} = graft.functions.KppInit.key($idc, $round, $dc);")
}

/** [[KppInit.sampleKey]] as a native expression: (id: BIGINT,
  * stream: INT) → BIGINT — the PQ init's per-subspace sample ordering,
  * one shuffle-free narrow column. */
case class SampleKeyExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "sample_key"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SampleKeyExpr = copy(left = l, right = r)

  override def nullSafeEval(id: Any, stream: Any): Any =
    KppInit.sampleKey(id.asInstanceOf[Long], stream.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (idc, sc) =>
      s"${ev.value} = graft.functions.KppInit.sampleKey($idc, $sc);")
}
