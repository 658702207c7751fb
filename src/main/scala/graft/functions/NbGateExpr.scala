package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row Naive-Bayes quality score over the fixed 10k hashed-2-gram
  * space — the streaming-admission form of
  * [[graft.operators.LmOps.nbScore]] (the fastText deployment shape:
  * classifier trained offline, gate inline). The trained weight table
  * rides inside the expression as a dense 10,000-slot array (the
  * bucket space is FIXED, so the probe is one array read — no map, no
  * boxing, no join), and the gram hashing reproduces
  * [[TextFunctions.shinglesFromTokens]](ts, 2) +
  * [[graft.operators.CorpusOps.splitBucket]] bit for bit: FNV-1a64
  * folded over `tokenᵢ ∥ 0x20 ∥ tokenᵢ₊₁` (never materializing the
  * gram string), then the double-pmod bucket fold, including the
  * short-document fallback (fewer than 2 tokens → the single
  * `concat_ws`-joined gram). LmOpsSpec's batch-parity law pins the
  * equality against the broadcast-join scorer.
  *
  * Returns struct(n_feats, score): n_feats counts grams whose bucket
  * has a trained weight (the inner-join semantics of the batch path);
  * score = prior + Σ matched weights. Pure per-row scalar — legal in
  * any streaming position. */
case class NbGateExpr(child: Expression, weights: Map[Long, Long],
    prior: Long)
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_feats", LongType, nullable = false),
    StructField("score", LongType, nullable = false)))
  override protected def withNewChildInternal(c: Expression): NbGateExpr =
    copy(child = c)
  override def prettyName: String = "nb_gate"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nb_gate needs ARRAY<STRING>, got ${other.sql}")
    }

  // dense 10k-slot weight table, built once per expression instance
  @transient private lazy val (wTable, wPresent): (Array[Long], Array[Boolean]) = {
    val w = new Array[Long](NbGateExpr.BucketSpace)
    val p = new Array[Boolean](NbGateExpr.BucketSpace)
    weights.foreach { case (b, v) =>
      require(b >= 0 && b < NbGateExpr.BucketSpace, s"bucket $b outside space")
      w(b.toInt) = v
      p(b.toInt) = true
    }
    (w, p)
  }

  private def fnvBytes(h0: Long, s: UTF8String): Long = {
    if (s eq null) return h0 // concat_ws skips nulls
    val bytes = s.getBytes
    var h = h0
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= NbGateExpr.FnvPrime
      i += 1
    }
    h
  }

  /** splitBucket's exact arithmetic on a raw FNV value. */
  private def bucketOf(h: Long): Int = {
    val p = java.lang.Math.floorMod(h, 10000L)
    java.lang.Math.floorMod(p + (if (h < 0) 1616L else 0L), 10000L).toInt
  }

  /** Instance entry point shared by eval and codegen. */
  def scoreOf(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    var feats = 0L
    var score = prior
    val n = arr.numElements()
    def add(h: Long): Unit = {
      val b = bucketOf(h)
      if (wPresent(b)) { feats += 1L; score += wTable(b) }
    }
    if (n >= 2) {
      var i = 0
      while (i < n - 1) {
        val a = arr.getUTF8String(i)
        val c = arr.getUTF8String(i + 1)
        // gram = concat_ws(" ", a, c): nulls drop WITH their separator
        var h = NbGateExpr.FnvBasis
        if ((a ne null) && (c ne null)) {
          h = fnvBytes(h, a)
          h ^= 0x20L; h *= NbGateExpr.FnvPrime
          h = fnvBytes(h, c)
        } else h = fnvBytes(fnvBytes(h, a), c)
        add(h)
        i += 1
      }
    } else {
      // shinglesFromTokens' short-doc fallback: ONE gram, the
      // space-joined (here: 0- or 1-token) array
      val h =
        if (n == 1) fnvBytes(NbGateExpr.FnvBasis, arr.getUTF8String(0))
        else NbGateExpr.FnvBasis
      add(h)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](feats, score))
  }

  override def nullSafeEval(v: Any): Any = scoreOf(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nbGate", this, classOf[NbGateExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.scoreOf($c);")
  }
}

object NbGateExpr {
  /** The fixed hashed-feature space — [[graft.operators.CorpusOps
    * .splitBucket]]'s 10,000 buckets. */
  val BucketSpace = 10000
  val FnvBasis: Long = 1469598103934665603L
  val FnvPrime: Long = 1099511628211L

  import org.apache.spark.sql.graftbridge.Bridge
  def of(tokens: Column, weights: Map[Long, Long], prior: Long): Column =
    Bridge.column(NbGateExpr(Bridge.expression(tokens), weights, prior))
}
