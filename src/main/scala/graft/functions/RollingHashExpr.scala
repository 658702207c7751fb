package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
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
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def withNewChildInternal(c: Expression): RollingHashExpr = copy(child = c)
  override def prettyName: String = "rolling_fingerprints"

  override def nullSafeEval(v: Any): Any = {
    val cps = v.asInstanceOf[UTF8String].toString.codePoints().toArray
    val out = new java.util.TreeSet[java.lang.Long]()
    if (cps.length >= window) {
      val M = RollingHashExpr.Mod
      val B = RollingHashExpr.Base
      // B^(window-1) mod M for the rolling subtraction
      var pow = 1L
      var i = 0
      while (i < window - 1) { pow = pow * B % M; i += 1 }
      var h = 0L
      i = 0
      while (i < window) { h = (h * B + cps(i) % M) % M; i += 1 }
      if (h % sampleMod == 0) out.add(h)
      i = window
      while (i < cps.length) {
        h = (h - cps(i - window) % M * pow % M + M * M) % M
        h = (h * B + cps(i) % M) % M
        if (h % sampleMod == 0) out.add(h)
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(arr)
  }
}

object RollingHashExpr {
  val Base = 257L
  val Mod = 1000000007L

  import org.apache.spark.sql.graftbridge.Bridge
  def of(text: Column, window: Int, sampleMod: Int): Column =
    Bridge.column(RollingHashExpr(Bridge.expression(text), window, sampleMod))
}
