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

  /** DuckDB word-3-gram DISTINCT shingles — mirrors
    * `ShingleExpressions.wordShinglesDistinct(text, 3)`. */
  val Shingles3: String =
    s"""list_distinct(CASE WHEN len($Toks) >= 3
       |  THEN list_transform(range(len($Toks) - 2),
       |       i -> array_to_string(($Toks)[i+1:i+3], ' '))
       |  ELSE [array_to_string($Toks, ' ')] END)""".stripMargin

  /** The MinHash signature CTE pair (`hv`, `sig`) over a CTE `sh(id,
    * shingles)`: one 60-bit md5 prefix per shingle, then k universal-hash
    * mixes `(a_i·h + b_i) mod 2^61-1` in HUGEINT — the exact integer math
    * of `graft.functions.MinHashMix`, constants interpolated from the
    * same arrays the Spark kernel reads. */
  def minhashSig(k: Int): String = {
    val aList = graft.functions.MinHashMix.A.take(k).mkString("[", ", ", "]")
    val bList = graft.functions.MinHashMix.B.take(k).mkString("[", ", ", "]")
    s"""hv AS (SELECT id, shingles, list_transform(shingles,
       |  s -> CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)) AS hs FROM sh),
       |sig AS (SELECT id, shingles,
       |  list_transform(range($k), i -> CAST(list_min(list_transform(hs,
       |    h -> CAST((CAST($aList[i+1] AS HUGEINT) * h + $bList[i+1])
       |         % 2305843009213693951 AS BIGINT))) AS VARCHAR)) AS signature FROM hv)""".stripMargin
  }

  /** The 4-band / 3-row LSH band-key explode over the `sig` CTE —
    * mirrors `Dedup.lshBandKeys` for the 12-hash signature. Emits a CTE
    * body: `SELECT id, shingles, <unnest> AS bk FROM sig`. */
  val Bands12x4: String =
    """SELECT id, shingles,
      |  unnest(list_transform(range(4), b -> CAST(b AS VARCHAR) || ':' ||
      |    md5(array_to_string(signature[b*3+1:b*3+3], '|')))) AS bk FROM sig""".stripMargin
}
