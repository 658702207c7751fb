package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native implementations of the hash-sketch kernels.
  *
  * The declarative versions in TextFunctions/Dedup are built from
  * higher-order array functions, which are CodegenFallback in Spark: every
  * lambda step allocates UTF8Strings and re-enters the interpreter, and
  * the SimHash formulation hashes each token once PER BIT. These
  * expressions compute the identical values imperatively in a single pass
  * per document — same md5 math, so the DuckDB oracle contract is
  * unchanged (verified by q28/q29 hash-matching both before and after).
  *
  * Interpreted `eval` (CodegenFallback) is fine here: the win is
  * algorithmic (one digest per (shingle,salt) with no lambda churn; one
  * digest per token instead of 16/64), not codegen fusion.
  */
object HashKernels {
  private val hexDigits = "0123456789abcdef".toCharArray

  def md5(md: MessageDigest, bytes: Array[Byte]): Array[Byte] = {
    md.reset()
    md.digest(bytes)
  }

  def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(i * 2) = hexDigits((d(i) >>> 4) & 15)
      out(i * 2 + 1) = hexDigits(d(i) & 15)
      i += 1
    }
    new String(out)
  }

  /** Unsigned lexicographic byte compare — equals comparing the hex
    * renderings, since byte order and hex-string order agree. */
  def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }
}

/** MinHash signature: for salt i in 0..k-1, the minimum md5 over
  * `shingle + "#" + i` — identical to
  * `transform(sequence(0,k-1), i -> array_min(transform(shingles,
  * s -> md5(concat(s,'#',i)))))` but one pass, digests compared as bytes
  * and hex-rendered once per signature element. */
case class MinHashSignatureExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  // containsNull = true: an EMPTY shingle array yields k null elements
  // (array_min over nothing is null in the declarative formulation too);
  // declaring non-null would hand codegen consumers garbage for that case
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override protected def withNewChildInternal(c: Expression): MinHashSignatureExpr = copy(child = c)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(v: Any): Any = {
    val shingles = v.asInstanceOf[ArrayData]
    val n = shingles.numElements()
    val md = MessageDigest.getInstance("MD5")
    val salts = Array.tabulate(numHashes)(i => s"#$i".getBytes(StandardCharsets.UTF_8))
    val maxSalt = if (numHashes == 0) 0 else salts.map(_.length).max
    val mins = new Array[Array[Byte]](numHashes)
    // one reusable buffer: shingle bytes copied ONCE per shingle, only
    // the salt suffix rewritten per hash — this loop runs
    // |shingles|·numHashes times per document, so per-digest allocations
    // and redundant copies dominate without it
    var buf = new Array[Byte](64)
    var j = 0
    while (j < n) {
      val s = shingles.getUTF8String(j).getBytes
      if (buf.length < s.length + maxSalt)
        buf = new Array[Byte](s.length + maxSalt)
      System.arraycopy(s, 0, buf, 0, s.length)
      var i = 0
      while (i < numHashes) {
        val salt = salts(i)
        System.arraycopy(salt, 0, buf, s.length, salt.length)
        md.reset()
        md.update(buf, 0, s.length + salt.length)
        val d = md.digest()
        if (mins(i) == null || HashKernels.lessThan(d, mins(i))) mins(i) = d
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins.map(d =>
      UTF8String.fromString(if (d == null) null else HashKernels.toHex(d))))
  }
}

/** 16-bit SimHash over a token array: one md5 per token, 16 vote counters
  * — identical math to Dedup's declarative md5-nibble formulation
  * (bit i = bit (3 - i%4) of hex digit i/4). */
case class SimHash16Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override protected def withNewChildInternal(c: Expression): SimHash16Expr = copy(child = c)
  override def prettyName: String = "simhash16"

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val md = MessageDigest.getInstance("MD5")
    val votes = new Array[Int](16)
    var j = 0
    while (j < n) {
      val d = HashKernels.md5(md, toks.getUTF8String(j).getBytes)
      // hex digits 0..3 = high/low nibbles of bytes 0..1
      val nibbles = Array((d(0) >>> 4) & 15, d(0) & 15, (d(1) >>> 4) & 15, d(1) & 15)
      var i = 0
      while (i < 16) {
        val bit = (nibbles(i / 4) >>> (3 - i % 4)) & 1
        votes(i) += (if (bit == 1) 1 else -1)
        i += 1
      }
      j += 1
    }
    var out = 0
    var i = 0
    while (i < 16) { if (votes(i) > 0) out |= 1 << i; i += 1 }
    Integer.valueOf(out)
  }
}

/** 64-bit SimHash over a token array: one xxhash64 (seed 42 — Spark's
  * `xxhash64` default) per token, 64 vote counters — identical math to
  * the declarative formulation in Dedup.simhash64Declarative, which
  * re-tests the SAME precomputed hash per bit but still walks the array
  * through 64 interpreted higher-order filter passes. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override protected def withNewChildInternal(c: Expression): SimHash64Expr = copy(child = c)
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = XxHash64Function.hash(toks.getUTF8String(j), StringType, 42L)
      var i = 0
      while (i < 64) {
        votes(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) out |= 1L << i; i += 1 }
    java.lang.Long.valueOf(out)
  }
}

/** FNV-1a 64-bit over the UTF-8 bytes of a string — the reference's
  * stable per-user rollout hash (reference: src/feature_flags.cpp:70-79).
  * Java Long multiplication wraps = mod 2^64, matching the C++ uint64_t;
  * consumers use `Long.remainderUnsigned` for the bucket. The DuckDB
  * oracle re-derives the identical fold with HUGEINT arithmetic.
  *
  * NOTE the offset basis is the reference's literal `1469598103934665603`
  * — a truncated transcription of the standard FNV-1a64 basis
  * 14695981039346656037 (trailing '7' dropped). Matching the reference's
  * constant bit-for-bit is deliberate: per-user rollout cohorts must not
  * reshuffle when a deployment migrates from the reference to this
  * engine. Do NOT "fix" this to the standard basis. */
case class Fnv1a64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override protected def withNewChildInternal(c: Expression): Fnv1a64Expr = copy(c)
  override def prettyName: String = "fnv1a64"

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 1469598103934665603L // reference's basis, see scaladoc
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 1099511628211L
      i += 1
    }
    java.lang.Long.valueOf(h)
  }
}

object HashExpressions {
  import org.apache.spark.sql.graftbridge.Bridge

  def minhashSignature(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignatureExpr(Bridge.expression(shingles), numHashes))

  def simhash16(tokens: Column): Column =
    Bridge.column(SimHash16Expr(Bridge.expression(tokens)))

  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64Expr(Bridge.expression(tokens)))

  def fnv1a64(s: Column): Column =
    Bridge.column(Fnv1a64Expr(Bridge.expression(s)))
}
