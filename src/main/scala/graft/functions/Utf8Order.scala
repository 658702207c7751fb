package graft.functions

/** UTF-8 binary (unsigned byte-wise) String ordering — the order Spark's
  * string sort (UTF8String.compareTo) and DuckDB's default collation
  * use. JVM `String` comparison differs: it compares UTF-16 code units,
  * which ranks BMP characters in U+E000..U+FFFF ABOVE supplementary-
  * plane characters. Every JVM-side tie-break that must agree with a
  * Spark orderBy or a DuckDB ROW_NUMBER (the BPE witness argmax, the
  * space-saving eviction/rank order) goes through this ordering, so
  * non-BMP tokens cannot flip a tie across engines.
  *
  * Compares by CODE POINT, which for well-formed strings equals UTF-8
  * byte order (UTF-8 is order-preserving over code points) — no byte
  * arrays are materialized. This matters because the ordering sits
  * inside SpaceSavingState's per-eviction O(capacity) min scan and the
  * sort of every summary: the previous getBytes-based form allocated
  * two full byte arrays per element comparison.
  *
  * UNPAIRED surrogates (malformed input) follow `String.getBytes`
  * semantics — the encoder replaces them with '?' (0x3F) — because
  * that is what Spark's `UTF8String.fromString` does too: a lone
  * surrogate must sort where Spark's binary orderBy actually puts it,
  * not at its raw code-point value. Agreement with the byte-wise form
  * is pinned by SpaceSavingSpec's utf8-order law (supplementary-plane
  * AND lone-surrogate inputs). */
object Utf8Order extends Ordering[String] {
  override def compare(x: String, y: String): Int = {
    var i = 0
    var j = 0
    while (i < x.length && j < y.length) {
      val cx = codePointAsEncoded(x, i)
      val cy = codePointAsEncoded(y, j)
      if (cx != cy) return Integer.compare(cx, cy)
      i += Character.charCount(x.codePointAt(i))
      j += Character.charCount(y.codePointAt(j))
    }
    (x.length - i) - (y.length - j)
  }

  /** The code point the UTF-8 ENCODER sees: unpaired surrogates become
    * '?' (what getBytes/UTF8String emit); paired surrogates already
    * come back combined from codePointAt. */
  private def codePointAsEncoded(s: String, i: Int): Int = {
    val cp = s.codePointAt(i)
    if (cp >= 0xD800 && cp <= 0xDFFF) '?' else cp
  }
}
