package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Approximate analytics for when exact is unaffordable at 100 TB:
  * count-min frequency sketches, HyperLogLog distinct estimates, and
  * Bloom membership filters — all mergeable one-pass aggregates (the
  * property that makes them scale: partial sketches combine map-side
  * and across executors, so the shuffle carries kilobytes, not keys).
  *
  * These intentionally trade exactness for size, so they are NOT in the
  * DuckDB-oracle surface; SketchSpec pins the bounds instead:
  * count-min never under-counts and over-counts ≤ eps·N at the given
  * confidence, HLL lands within its rsd, Bloom has no false negatives.
  * Exact companions exist for each (q59/q67 term counts, q45 distinct,
  * the q74 fingerprint anti-join) — the sketch is the scale path, the
  * exact form the correctness witness. */
object Sketches {

  /** Count-min sketch over one column, returned as Spark's serialized
    * sketch binary (mergeable; `CountMinSketch.readFrom` to query).
    * eps bounds relative over-count; one pass, map-side combinable. */
  def countMinSketch(df: DataFrame, colName: String,
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): CountMinSketch = {
    val bytes = df.select(count_min_sketch(col(colName), lit(eps),
      lit(confidence), lit(seed)).as("sk")).head.getAs[Array[Byte]](0)
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  /** Token-frequency sketch over a text corpus: one explode + one
    * sketch aggregation. The scale alternative to the exact q59/q67
    * term-count shuffles when only approximate frequencies are needed
    * (stopword discovery, head-of-distribution monitoring). */
  def tokenFrequencySketch(docs: DataFrame, textCol: String = "text",
      eps: Double = 0.001, confidence: Double = 0.99): CountMinSketch =
    countMinSketch(docs.select(explode(
      graft.functions.TextFunctions.tokens(col(textCol))).as("t")), "t",
      eps, confidence)

  /** Per-group HyperLogLog distinct estimate next to the exact count's
    * query shape; `rsd` is the standard-deviation knob (Spark's HLL++). */
  def distinctEstimate(df: DataFrame, groupCol: String, valueCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(col(groupCol))
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Bloom filter over a column (e.g. the q74 fingerprint store): no
    * false negatives, so `mightContain == false` PROVES absence — the
    * pre-filter that lets an incremental dedup skip the exact anti-join
    * for the (vast) definitely-fresh majority and shuffle only the
    * maybe-duplicate sliver. Sized by expectedItems/fpp. */
  def bloomFilter(df: DataFrame, colName: String, expectedItems: Long,
      fpp: Double = 0.01): BloomFilter =
    df.stat.bloomFilter(colName, expectedItems, fpp)

  /** Frequency lookups against a count-min sketch for a set of probe
    * terms, as (term, estimate) rows — driver-side sketch, executor-free
    * probe (the sketch is the whole state). */
  def estimateAll(sketch: CountMinSketch, terms: Seq[String]): Seq[(String, Long)] =
    terms.map(t => t -> sketch.estimateCount(t))

  /** Exact term counts for a probe set — the witness the spec compares
    * sketch estimates against. */
  def exactCounts(docs: DataFrame, terms: Seq[String],
      textCol: String = "text"): Map[String, Long] = {
    val t = docs.select(explode(
      graft.functions.TextFunctions.tokens(col(textCol))).as("t"))
      .filter(col("t").isin(terms: _*))
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
    t.collect().map(r => r.getString(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
  }
}
