package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, shingling, language-ID heuristic, quality scoring,
  * fingerprinting, MinHash signatures.
  *
  * All are pure Column expression trees (no UDFs) so they stay inside
  * whole-stage codegen and scale linearly with input — the per-document
  * work is independent, so 100 TB of documents is embarrassingly parallel
  * with zero shuffles until an aggregation/join consumes the results.
  *
  * Hash choice: md5 (hex string) everywhere a hash feeds a cross-engine
  * contract — it is bit-identical in Spark and DuckDB, so the oracle can
  * re-derive signatures. xxhash64 variants exist for hot paths where the
  * oracle is not involved.
  */
object TextFunctions {

  /** Whitespace tokens, empty-safe (leading blanks yield no empty token). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish regex token count: words, numbers, punctuation runs each
    * count — a cheap stand-in for subword tokenizer cost estimation. */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"))

  /** Word n-gram shingles (space-joined), distinct not applied. */
  def wordShingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** [[wordShingles]] over an ALREADY-TOKENIZED array column.
    *
    * Built as `arrays_zip` of the n shifted slices rather than a
    * `transform(sequence(...), i => slice(ts, i+1, n))` lambda: inside a
    * higher-order-function lambda every reference to `ts` is the full
    * expression SUBTREE, re-evaluated per element (Catalyst's
    * common-subexpression elimination does not descend into lambdas), so
    * the lambda form re-runs the whole tokenization per GRAM when handed
    * `tokens(text)` — O(doc_len · n_grams) per document. The zip form
    * evaluates `ts` exactly n times per ROW (once per shifted slice),
    * and the lambda touches only its own element. Measured on q128 at
    * sf1.0: 35 s → 6.6 s. */
  def shinglesFromTokens(ts: Column, n: Int): Column = {
    val len = size(ts) - (n - 1)
    val zipped = arrays_zip((1 to n).map(k => slice(ts, lit(k), len)): _*)
    when(size(ts) >= n,
      transform(zipped, e =>
        concat_ws(" ", (0 until n).map(j => e.getField(j.toString)): _*)))
      .otherwise(array(concat_ws(" ", ts)))
  }

  /** Character n-grams of the raw text. */
  def charNgrams(text: Column, n: Int): Column =
    when(length(text) >= n,
      transform(sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))
      .otherwise(array(text))

  /** MinHash signature — declarative parity witness for
    * [[HashExpressions.minhashSignature]]'s one-pass kernel: element i is
    * `min over shingles of (a_i·h60(md5(s)) + b_i) mod 2^61-1` with the
    * [[MinHashMix]] constants, decimal-rendered. The 121-bit product runs
    * in decimal(38,0) — exact, since 19+19 digit operands fit. */
  def minhashSignature(shingles: Column, k: Int): Column = {
    val aArr = array(MinHashMix.A.take(k).map(lit): _*)
    val bArr = array(MinHashMix.B.take(k).map(lit): _*)
    val p = lit(MinHashMix.P).cast("decimal(38,0)")
    transform(sequence(lit(0), lit(k - 1)), i => {
      val mins = transform(shingles, s => {
        val h = conv(substring(md5(s), 1, 15), 16, 10).cast("decimal(19,0)")
        val a = element_at(aArr, i + 1).cast("decimal(19,0)")
        val b = element_at(bArr, i + 1).cast("decimal(38,0)")
        ((a * h + b) % p).cast("long")
      })
      array_min(mins).cast("string")
    })
  }

  /** LSH band keys from a signature: bands of `rowsPerBand` elements,
    * each hashed to one bucket key. Docs sharing any band key become
    * join candidates — the scale path that avoids O(N²). */
  def lshBandKeys(signature: Column, rowsPerBand: Int): Column =
    transform(sequence(lit(0), (size(signature) / rowsPerBand).cast("int") - 1),
      b => concat(b.cast("string"), lit(":"),
        md5(concat_ws("|", slice(signature, b * rowsPerBand + lit(1), lit(rowsPerBand))))))

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. (Real pipelines plug in fastText-style models via the same
    * column contract.) */
  val StopwordLists: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"),
    "zh" -> Seq("de", "shi", "bu", "le", "zai", "you", "wo", "ta", "men", "zhe"))

  /** Per-language stopword hit count over the token array. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Language-ID: argmax of stopword hit counts; ties broken by language
    * code ascending; zero hits everywhere → "und". */
  def langIdHeuristic(text: Column): Column = {
    val ts = tokens(text)
    val hits = StopwordLists.map { case (lang, words) => lang -> stopwordHits(ts, words) }
    val best = greatest(hits.map(_._2): _*)
    hits.sortBy(_._1).foldRight(lit("und")) { case ((lang, h), acc) =>
      when(best > 0 && h === best, lit(lang)).otherwise(acc)
    }
  }

  /** Quality score in [0,1]: length saturation + low punctuation density +
    * stopword presence (the reference-free heuristics every corpus
    * pipeline starts with). Deterministic per-row double arithmetic. */
  def qualityScore(text: Column): Column = {
    val ts = tokens(text)
    val nTok = size(ts).cast("double")
    val lenScore = least(nTok / 50.0, lit(1.0))
    val punct = (length(text) - length(regexp_replace(text, "[.,;:!?'\"()\\[\\]{}]", "")))
      .cast("double")
    val punctRatio = when(length(text) > 0, punct / length(text).cast("double")).otherwise(0.0)
    val enHits = stopwordHits(ts, StopwordLists.head._2).cast("double")
    val stopRatio = when(nTok > 0, enHits / nTok).otherwise(0.0)
    lenScore * 0.4 + (lit(1.0) - least(punctRatio * 5.0, lit(1.0))) * 0.3 +
      least(stopRatio * 5.0, lit(1.0)) * 0.3
  }

  /** Exact-content fingerprint: md5 of whitespace-normalized lowercase. */
  def contentFingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** Order-insensitive bag fingerprint: md5 over the sorted distinct
    * token set — a cheap rolling-hash-class document signature. */
  def bagFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))
}
