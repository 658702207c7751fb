package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Sketches}

/** Sketch error-bound pins: count-min never under-counts and stays
  * within eps·N, HLL lands near exact, Bloom never false-negatives and
  * its dedup pre-filter changes nothing about the exact result. */
class SketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("sketch-spec", "4").getOrCreate()
  import spark.implicits._

  private def docs = graft.core.Tables(spark, "/root/testdata/sf0.01").documents

  test("count-min token frequencies: no under-count, eps*N over-count bound") {
    val d = docs
    val sketch = Sketches.tokenFrequencySketch(d, eps = 0.001)
    val n = sketch.totalCount()
    assert(n > 0)
    // probe the head and a absent term
    val probes = Seq("the", "of", "and", "data", "zzz_never_in_corpus")
    val exact = Sketches.exactCounts(d, probes)
    Sketches.estimateAll(sketch, probes).foreach { case (t, est) =>
      assert(est >= exact(t), s"$t under-counted: $est < ${exact(t)}")
      assert(est <= exact(t) + (0.001 * n).toLong + 1,
        s"$t over-counted beyond eps*N: $est vs ${exact(t)} (N=$n)")
    }
  }

  test("HLL distinct-per-language estimate within rsd of exact") {
    val exact = docs.groupBy(col("lang")).agg(countDistinct(col("doc_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Sketches.distinctEstimate(docs, "lang", "doc_id", rsd = 0.02)
      .collect().foreach { r =>
        val (lang, est) = (r.getString(0), r.getLong(1))
        val ex = exact(lang).toDouble
        assert(math.abs(est - ex) / ex < 0.1, s"$lang: est $est vs exact $ex")
      }
  }

  test("incrementalDedupBloom returns exactly the plain exact-dedup result") {
    val d = docs.limit(3000)
    val store = d.filter(col("doc_id") % 3 === 0)
      .select(graft.functions.TextFunctions.contentFingerprint(col("text")).as("fp"))
      .distinct()
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = ids(Dedup.incrementalDedup(d, store))
    // a deliberately undersized filter (high fpp) still changes nothing —
    // false positives only route rows through the exact join
    val viaBloom = ids(Dedup.incrementalDedupBloom(d, store,
      expectedItems = 100, fpp = 0.5))
    assert(viaBloom == exact)
    val viaBloomSized = ids(Dedup.incrementalDedupBloom(d, store,
      expectedItems = 2000, fpp = 0.01))
    assert(viaBloomSized == exact)
  }

  test("null-text docs survive incremental dedup, once, in both forms") {
    // null text has a null md5 — without the store-fingerprint sentinel
    // the (fp, id) equi-joins would silently drop these rows (and the
    // bloom probe would NPE on a null key)
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "real text"),
        org.apache.spark.sql.Row(2L, null),
        org.apache.spark.sql.Row(3L, null),
        org.apache.spark.sql.Row(4L, "real text"))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val empty = Seq.empty[String].toDF("fp")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    // doc 2 represents the null-text group; doc 4 dups doc 1
    val exact = ids(Dedup.incrementalDedup(d, empty))
    assert(exact == Set(1L, 2L))
    assert(ids(Dedup.incrementalDedupBloom(d, empty,
      expectedItems = 10, fpp = 0.1)) == exact)
    // and a store carrying the null sentinel suppresses later null docs
    val store2 = Dedup.updatedFingerprintStore(empty, d)
    val next = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(9L, null),
        org.apache.spark.sql.Row(10L, "fresh text"))),
      d.schema)
    assert(ids(Dedup.incrementalDedup(next, store2)) == Set(10L))
  }

  test("bloom pre-filter: no false negatives, exact dedup result unchanged") {
    val d = docs.limit(2000)
    val store = d.filter(col("doc_id") % 3 === 0)
      .select(graft.functions.TextFunctions.contentFingerprint(col("text")).as("fp"))
      .distinct()
    val bloom = Sketches.bloomFilter(store, "fp", expectedItems = 1000)
    // every stored fp answers true (no false negatives, the dedup-safety
    // property: bloom=false rows may skip the exact anti-join entirely)
    store.collect().foreach(r => assert(bloom.mightContain(r.getString(0))))
    // the pre-filter routes, never changes results: survivors whose fp
    // tests false are PROVABLY fresh — union(bloom-false, exact-checked
    // bloom-true survivors) == plain exact survivors
    val batch = d.select(col("doc_id"),
      graft.functions.TextFunctions.contentFingerprint(col("text")).as("fp"))
    val bloomTrue = batch.filter(r => bloom.mightContain(r.getString(1)))
    val bloomFalseIds = batch.collect()
      .filter(r => !bloom.mightContain(r.getString(1))).map(_.getLong(0)).toSet
    val exactFresh = Dedup.incrementalDedup(d, store)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // bloom-false ids must all be fresh in the exact result (no FN) —
    // within this batch of distinct docs first-id-wins keeps them all
    assert(bloomFalseIds.subsetOf(exactFresh))
    // and every id the bloom filter let through to the exact join covers
    // the rest of the fresh set
    val checkedFresh = Dedup.incrementalDedup(
      d.join(bloomTrue.select(col("doc_id")), Seq("doc_id")), store)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bloomFalseIds ++ checkedFresh == exactFresh)
  }

  test("distinctEstimateChecked: verdict TRUE everywhere, exact counts exact") {
    val rows = Sketches.distinctEstimateChecked(docs, "lang", "doc_id",
      rsd = 0.05).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)), "an HLL estimate left the 3-sigma band")
    val exact = docs.groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == exact(r.getString(0))))
  }

  test("hllMergeContract: merged-union estimate stays within band") {
    val rows = Sketches.hllMergeContract(docs, "lang", "source", "doc_id")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)),
      "a merged-union HLL estimate left the 3-sigma band")
    assert(rows.forall(_.getBoolean(3)), "an HLL estimate left the 3-sigma band")
    val exact = docs.groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == exact(r.getString(0))))
  }

  test("cmsCheckedTopTokens: top-k exact counts with an all-TRUE contract") {
    val rows = Sketches.cmsCheckedTopTokens(docs, k = 20).collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getBoolean(2)), "a CMS estimate broke its bound")
    // the emitted exact counts really are the global top-20
    val top = docs.select(explode(
      graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t").asc).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSet == top)
  }

  // -------------------- count-min join-cardinality estimation (q212)

  test("cms join estimate: never undercounts, exact witness correct, collisions only inflate") {
    val left = (1L to 200L).flatMap(k => Seq.fill((k % 3 + 1).toInt)(k))
      .toDF("k")
    val right = (101L to 300L).flatMap(k => Seq.fill((k % 2 + 1).toInt)(k))
      .toDF("k")
    val trueJoin = left.join(right, "k").count()
    for (width <- Seq(4, 64, 4096)) {
      val rows = Sketches.cmsJoinCardinality(left, "k", right, "k",
        depth = 4, width = width).collect()
      assert(rows.length == 4, s"width $width")
      assert(rows.forall(_.getBoolean(3)), s"width $width: undercount")
      assert(rows.forall(_.getLong(2) == trueJoin),
        s"width $width: exact witness ${rows.head.getLong(2)} != $trueJoin")
      val minEst = rows.map(_.getLong(1)).min
      assert(minEst >= trueJoin, s"width $width")
      // tiny width must inflate strictly (4 buckets for 300 keys);
      // a roomy width should sit close to exact (sanity, not a bound)
      if (width == 4) assert(minEst > trueJoin, "collisions must show at width 4")
    }
  }

  test("cms key sketch: mergeability (sketch of union == cellwise sum of sketches)") {
    val a = (1L to 150L).toDF("k")
    val b = (100L to 250L).toDF("k")
    val all = a.union(b)
    def cells(df: org.apache.spark.sql.DataFrame) =
      Sketches.cmsKeySketch(df, "k", depth = 4, width = 64)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (cells(a).toSeq ++ cells(b).toSeq)
      .groupBy(_._1).map { case (c, vs) => c -> vs.map(_._2).sum }
    assert(cells(all) == merged)
  }

  test("cms sketch ingest: streamed cells serve the one-shot sketch across replay and compaction") {
    import graft.streaming.SketchIngest
    val dir = java.nio.file.Files.createTempDirectory("graft-cms").toString
    val batches = Seq(
      (1L to 100L).toDF("k"),
      (50L to 180L).toDF("k"),
      (170L to 260L).toDF("k"))
    def served() = SketchIngest.serve(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    def oneShot(n: Int) = Sketches.cmsKeySketch(
      batches.take(n).reduce(_ union _), "k", depth = 4, width = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    SketchIngest.ingest(batches(0), dir, "b0", "k", 4, 64)
    SketchIngest.ingest(batches(1), dir, "b1", "k", 4, 64)
    // replay b1: batch-id-keyed overwrite, cells unchanged
    SketchIngest.ingest(batches(1), dir, "b1", "k", 4, 64)
    assert(served() == oneShot(2), "after two batches + replay")
    assert(graft.sources.SketchStore.compact(spark, dir, 2) >= 1)
    SketchIngest.ingest(batches(2), dir, "b2", "k", 4, 64)
    assert(served() == oneShot(3), "after compaction + third batch")
    // the streamed estimator equals the batch estimator on the union
    val right = (200L to 400L).flatMap(k => Seq.fill(2)(k)).toDF("k")
    val streamed = SketchIngest.estimateAgainst(spark, dir, right, "k", 4, 64)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val batch = Sketches.cmsJoinCardinality(
      batches.reduce(_ union _), "k", right, "k", depth = 4, width = 64)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(streamed == batch,
      s"streamed=$streamed batch=$batch")
  }

  test("cms join estimate: disjoint keys estimate only collision mass") {
    val a = (1L to 100L).toDF("k")
    val b = (1001L to 1100L).toDF("k")
    val rows = Sketches.cmsJoinCardinality(a, "k", b, "k",
      depth = 4, width = 4096).collect()
    assert(rows.forall(_.getLong(2) == 0L), "exact must be 0 on disjoint keys")
    assert(rows.forall(_.getBoolean(3)))
    // 100x100 pairs over 4096 buckets: expectation ~2.4 collisions/row;
    // the min over 4 rows being far above that would mean a broken hash
    assert(rows.map(_.getLong(1)).min <= 20L,
      s"collision mass implausibly high: ${rows.map(_.getLong(1)).mkString(",")}")
  }
}
