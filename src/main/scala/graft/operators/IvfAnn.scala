package graft.operators

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: learned KMeans
  * centroids partition the corpus into `nlist` lists; a query scores only
  * the vectors in its `nprobe` nearest lists.
  *
  * This is the learned-bucket counterpart of [[Similarity.lshTopK]] with
  * the exact same join shape: bucket assignment is O(corpus·nlist) once
  * (and is itself a Spark job), the probe join is an equi-join on
  * list id, so query cost is O(corpus·nprobe/nlist) instead of O(corpus).
  * At 100 TB the assignment table is written once (partitioned by
  * list_id, giving partition pruning on probes) and reused.
  *
  * Invariant the spec pins: nprobe == nlist degenerates to exactly the
  * brute-force result (same scores, same order).
  */
object IvfAnn {

  /** `model` is present on a freshly-built index and absent on one
    * reloaded from disk — probing needs only assignments + centroids. */
  final case class IvfIndex(model: Option[KMeansModel], assignments: DataFrame,
      centroids: DataFrame)

  /** Train centroids and assign every corpus vector to its list. */
  def build(corpus: DataFrame, nlist: Int, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding")
      (implicit spark: SparkSession): IvfIndex = {
    import spark.implicits._
    val withVec = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("_fv", array_to_vector(col("v").cast("array<double>")))
    val model = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("_fv").setPredictionCol("list_id")
      .fit(withVec)
    val assignments = model.transform(withVec)
      .select(col("id"), col("v"), col("list_id"))
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq
      .toDF("list_id", "centroid")
    IvfIndex(Some(model), assignments, centroids)
  }

  /** Persist the index: assignments PARTITIONED BY list_id (so a probe
    * reading `nprobe` lists touches `nprobe` directories — partition
    * pruning does the work the inverted file does in a single-node ANN
    * library), centroids as one tiny parquet. Build once, probe many —
    * the 100 TB shape where re-assigning the corpus per query batch
    * would dwarf the query itself. */
  def write(index: IvfIndex, path: String): Unit = {
    index.assignments.write.mode("overwrite")
      .partitionBy("list_id").parquet(s"$path/assignments")
    index.centroids.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Reload a persisted index for probing (no model needed). */
  def read(spark: SparkSession, path: String): IvfIndex =
    IvfIndex(None,
      spark.read.parquet(s"$path/assignments")
        .select(col("id"), col("v"), col("list_id").cast("int").as("list_id")),
      spark.read.parquet(s"$path/centroids"))

  /** Squared L2 distance — the one-pass native kernel (same sequential
    * fold and double promotion as the declarative
    * `aggregate(zip_with((x-y)²))` predecessor, parity-spec'd, so
    * nearest-centroid ties cannot move). This sits in the index's
    * hottest loop: assign/probe evaluate it per (vector, centroid). */
  private def sqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.VectorExpressions.sqDist(a, b)

  /** The declarative predecessor, kept as [[sqDist]]'s parity witness. */
  private[graft] def sqDistDeclarative(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    }), lit(0.0), (acc, v) => acc + v)

  /** Assign vectors to their nearest existing list — the ingestion half
    * of incremental index maintenance: new corpus batches join the index
    * without retraining. One broadcast of the (tiny) centroid table and
    * one corpus pass; ties break on list_id for determinism. */
  def assign(vectors: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("cdist").asc, col("list_id").asc)
    vectors.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(centroids))
      .withColumn("cdist", sqDist(col("v"), col("centroid")))
      .withColumn("_r", row_number().over(w)).filter(col("_r") === 1)
      .select(col("id"), col("v"), col("list_id"))
  }

  /** Absorb a new vector batch and run ONE Lloyd step: assign the batch
    * to the nearest current centroids, then recompute every centroid as
    * the mean of its (old ∪ new) members — the mini-batch KMeans
    * maintenance loop that keeps lists balanced as the corpus grows,
    * without the full `build` retrain. Probing invariants are preserved
    * by construction (nprobe == nlist still scans everything, so it
    * stays exactly brute force no matter how centroids drift).
    *
    * Shape: centroid recompute is per-(list, dim) mean — explode to
    * (list_id, pos, x), one combinable agg, then regroup to arrays of
    * `dim` elements (bounded by embedding width, never by list size). */
  def refresh(index: IvfIndex, newVectors: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): IvfIndex = {
    val all = index.assignments
      .unionByName(assign(newVectors, index.centroids, idCol, vecCol))
    val centroids = all
      .select(col("list_id"), posexplode(col("v").cast("array<double>")).as(Seq("pos", "x")))
      .groupBy(col("list_id"), col("pos")).agg(avg(col("x")).as("m"))
      .groupBy(col("list_id"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))
    IvfIndex(None, all, centroids)
  }

  /** The int8 form of an index: assignment vectors are replaced by
    * their quantization codes as array<tinyint> (1 B per dimension on
    * the persisted, list-partitioned layout — the 4× cut applied to
    * the structure that IS the 100 TB corpus copy). Probing stays
    * ASYMMETRIC, the FAISS-SQ shape: list selection and scoring both
    * keep the query at full precision — cosine(q, codes) equals
    * cosine(q, dequantized corpus vector) because the per-vector scale
    * cancels — so only the corpus side pays quantization noise.
    * [[topK]] works unchanged on the result (the cosine kernel
    * dispatches on the element type). */
  def quantized(index: IvfIndex): IvfIndex =
    index.copy(model = None, assignments = index.assignments.select(
      col("id"),
      transform(graft.functions.VectorExpressions.quantizeInt8(col("v"))
        .getField("codes"), _.cast("byte")).as("v"),
      col("list_id")))

  /** Recall-vs-nprobe curve: recall@k of the probed index against the
    * exact brute-force baseline over the SAME corpus, one row per
    * nprobe — the measurement that prices the accuracy/cost dial before
    * a 100 TB rollout (each +1 nprobe reads one more list partition per
    * query). Exact integer permille, deterministic at a fixed build
    * seed. A diagnostic run over a bounded query batch: the per-point
    * counts are driver actions by design (like [[graft.core.ScaleOps
    * .keySkew]], this is something you run once per index build, not
    * per query). KMeans is not SQL-expressible, so this surface is
    * spec-pinned (IvfSpec) rather than DuckDB-oracled. */
  def recallCurve(queries: DataFrame, index: IvfIndex, k: Int,
      nprobes: Seq[Int], idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(nprobes.nonEmpty, "need at least one nprobe point")
    val spark = queries.sparkSession
    import spark.implicits._
    val corpus = index.assignments
      .select(col("id").as(idCol), col("v").as(vecCol))
    val truth = Similarity.bruteForceTopK(queries, corpus, k, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nTrue = truth.count()
    val rows = nprobes.sorted.map { np =>
      val hits = topK(queries, index, k, np, idCol, vecCol)
        .select(col("query_id"), col("neighbor_id"))
        .join(truth, Seq("query_id", "neighbor_id")).count()
      (np, hits, nTrue, if (nTrue > 0) hits * 1000L / nTrue else 1000L)
    }
    truth.unpersist()
    rows.toDF("nprobe", "n_hits", "n_true", "recall_permille")
  }

  /** The production semantic-dedup entry: the SemDeDup keep policy
    * ([[Similarity.semanticDedup]]) over a PERSISTED index — centroids
    * and list-partitioned assignments read from disk, which satisfies
    * semanticDedup's materialized-frame contract naturally (its four
    * plan references become pruned parquet re-scans, never a recompute
    * of the KMeans assignment). The oracled q89 pins the identical
    * keep-policy math on SQL-replicable LSH clusters; this path swaps
    * in the learned lists. */
  def semanticDedupPersisted(spark: SparkSession, path: String,
      threshold: Double, maxListSize: Option[Int] = None)
      : (DataFrame, DataFrame) =
    Similarity.semanticDedup(read(spark, path).assignments, threshold,
      maxListSize)

  /** ANN top-k through the index: probe the nprobe nearest lists.
    *
    * Against a persisted index ([[read]]), the probe equi-join on
    * `list_id` hits the partitioned layout: the probe side is a broadcast
    * (queries × nprobe rows), so Spark's dynamic partition pruning skips
    * every unprobed list directory at scan time. */
  def topK(queries: DataFrame, index: IvfIndex, k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    // rank centroids per query; keep the nprobe nearest lists
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cdist").asc, col("list_id").asc)
    val probes = q.crossJoin(broadcast(index.centroids))
      .withColumn("cdist", sqDist(col("qv"), col("centroid")))
      .withColumn("crank", row_number().over(probeW))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("qv"), col("list_id"))
    // probe join: only vectors in the selected lists are scored
    val scored = probes.join(index.assignments, Seq("list_id"))
      .filter(col("query_id") =!= col("id"))
      .withColumn("cosine", Similarity.cosine(col("qv"), col("v")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("cosine"), col("rank"))
  }
}
