package graft.queries

/** The cross-engine SQL contract helpers shared by every oracle module —
  * ONE definition each, so a future correction cannot leave two modules
  * computing different bucket spaces or gram conventions.
  */
private[queries] object OracleSql {

  /** DuckDB whitespace tokens, empty-safe — mirrors
    * `TextFunctions.tokens`. */
  val Toks: String =
    """list_filter(regexp_split_to_array(text, '\s+'), t -> t != '')"""

  /** DuckDB word n-gram list — mirrors `TextFunctions.wordShingles(text,
    * n)` incl. the single-gram convention for docs under n tokens. */
  def grams(n: Int): String =
    s"""CASE WHEN len($Toks) >= $n
       |  THEN list_transform(range(len($Toks) - ${n - 1}),
       |       i -> array_to_string(($Toks)[i+1:i+$n], ' '))
       |  ELSE [array_to_string($Toks, ' ')] END""".stripMargin

  /** The FNV-1a64 HUGEINT fold over a string expression, reduced to the
    * UNSIGNED bucket in [0, 10000) — the exact arithmetic of
    * `CorpusOps.splitBucket` / the q50 expression (PropertySpec pins the
    * Spark kernel against a byte-fold reference). */
  def fnvBucket(s: String): String =
    s"""CAST(list_reduce(
       |  list_prepend(CAST('1469598103934665603' AS HUGEINT),
       |    list_transform(range(length($s)),
       |      i -> CAST(unicode(substr($s, CAST(i+1 AS INT), 1)) AS HUGEINT))),
       |  (h, c) -> (xor(h, c) * CAST('1099511628211' AS HUGEINT))
       |            % CAST('18446744073709551616' AS HUGEINT))
       |  % 10000 AS BIGINT)""".stripMargin
}
