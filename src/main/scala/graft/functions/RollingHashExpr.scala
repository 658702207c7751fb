package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin-Karp rolling-hash document fingerprints with deterministic
  * mod-sampling — the rolling-hash fingerprint family of training-data
  * pipelines (substring-containment dedup: a doc wholly copied inside a
  * larger doc shares its sampled window hashes, which ordinary
  * whole-document fingerprints miss).
  *
  * Hash: polynomial code-point hash of every `window`-length character
  * window, base 257 mod 1e9+7 (values stay < 2^40, so the math is exact
  * in BIGINT for both Spark and the DuckDB oracle — no 128-bit needed).
  * The rolling update makes the pass O(len); sampling keeps windows with
  * hash % sampleMod == 0 (~1/sampleMod of them), a content-defined
  * selection both engines reproduce exactly. Output: sorted distinct
  * sampled hashes.
  */
case class RollingHashExpr(child: Expression, window: Int, sampleMod: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def withNewChildInternal(c: Expression): RollingHashExpr = copy(child = c)
  override def prettyName: String = "rolling_fingerprints"

  override def nullSafeEval(v: Any): Any =
    RollingHashExpr.sampled(v.asInstanceOf[UTF8String], window, sampleMod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHashExpr$$.MODULE$$" +
        s".sampled($c, $window, $sampleMod);")
}

object RollingHashExpr {
  val Base = 257L
  val Mod = 1000000007L

  /** All window hashes of the text, in position order (the shared
    * rolling recurrence; no sampling). */
  private[functions] def windowHashes(cps: Array[Int], window: Int): Array[Long] = {
    if (cps.length < window) return Array.emptyLongArray
    val M = Mod
    val B = Base
    var pow = 1L
    var i = 0
    while (i < window - 1) { pow = pow * B % M; i += 1 }
    val out = new Array[Long](cps.length - window + 1)
    var h = 0L
    i = 0
    while (i < window) { h = (h * B + cps(i) % M) % M; i += 1 }
    out(0) = h
    i = window
    while (i < cps.length) {
      h = (h - cps(i - window) % M * pow % M + M * M) % M
      h = (h * B + cps(i) % M) % M
      out(i - window + 1) = h
      i += 1
    }
    out
  }

  // kernel bodies callable from generated code (and nullSafeEval)

  def sampled(text: UTF8String, window: Int, sampleMod: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val hs = windowHashes(cps, window)
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < hs.length) {
      if (hs(i) % sampleMod == 0) out.add(hs(i))
      i += 1
    }
    toArrayData(out)
  }

  def winnowedKernel(text: UTF8String, window: Int, winnowWindow: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val hs = windowHashes(cps, window)
    val out = new java.util.TreeSet[java.lang.Long]()
    if (hs.nonEmpty) {
      val w = math.min(winnowWindow, hs.length)
      // monotonic deque of indices, increasing hash values front→back
      val deque = new java.util.ArrayDeque[Int]()
      var i = 0
      while (i < hs.length) {
        while (!deque.isEmpty && hs(deque.peekLast()) >= hs(i)) deque.pollLast()
        deque.addLast(i)
        if (deque.peekFirst() <= i - w) deque.pollFirst()
        if (i >= w - 1) out.add(hs(deque.peekFirst()))
        i += 1
      }
    }
    toArrayData(out)
  }

  private def toArrayData(out: java.util.TreeSet[java.lang.Long]): ArrayData = {
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(arr)
  }

  import org.apache.spark.sql.graftbridge.Bridge
  def of(text: Column, window: Int, sampleMod: Int): Column =
    Bridge.column(RollingHashExpr(Bridge.expression(text), window, sampleMod))

  def winnowed(text: Column, window: Int, winnowWindow: Int): Column =
    Bridge.column(WinnowedHashExpr(Bridge.expression(text), window, winnowWindow))
}

/** Winnowing selection over the rolling window hashes: the distinct set
  * of minimum hashes over every `winnowWindow` consecutive window
  * hashes (Schleimer/Wilkerson/Aiken). Unlike mod-sampling, winnowing
  * GUARANTEES a fingerprint within every winnowWindow-length stretch —
  * no adversarial content can produce long unsampled gaps — at ~1 per
  * winnowWindow/2 density. Sliding-window minimum via monotonic deque:
  * O(len) per document. */
case class WinnowedHashExpr(child: Expression, window: Int, winnowWindow: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def withNewChildInternal(c: Expression): WinnowedHashExpr = copy(child = c)
  override def prettyName: String = "winnowed_fingerprints"

  override def nullSafeEval(v: Any): Any =
    RollingHashExpr.winnowedKernel(v.asInstanceOf[UTF8String], window, winnowWindow)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHashExpr$$.MODULE$$" +
        s".winnowedKernel($c, $window, $winnowWindow);")
}
