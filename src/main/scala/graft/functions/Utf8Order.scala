package graft.functions

/** UTF-8 binary (unsigned byte-wise) String ordering — the order Spark's
  * string sort (UTF8String.compareTo) and DuckDB's default collation
  * use. JVM `String` comparison differs: it compares UTF-16 code units,
  * which ranks BMP characters in U+E000..U+FFFF ABOVE supplementary-
  * plane characters. Every JVM-side tie-break that must agree with a
  * Spark orderBy or a DuckDB ROW_NUMBER (the BPE witness argmax, the
  * space-saving eviction/rank order) goes through this ordering, so
  * non-BMP tokens cannot flip a tie across engines. */
object Utf8Order extends Ordering[String] {
  override def compare(x: String, y: String): Int = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }
}
