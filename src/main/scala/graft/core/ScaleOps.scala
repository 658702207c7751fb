package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale techniques as reusable operators: key salting for skewed
  * aggregations/joins and bucketed tables for shuffle-free co-located
  * joins. AQE handles *detected* skew at runtime; these are for the
  * cases you know about up front (hot keys in a 100 TB fact table,
  * repeatedly-joined dimensions).
  */
object ScaleOps {

  /** Two-stage salted aggregation: `groupBy(key, salt) partial → groupBy
    * (key) final`. Correct for decomposable aggregates (sum/count/min/
    * max); the caller passes both phases explicitly so the algebra is
    * visible. A hot key's rows spread over `saltBuckets` reducers in
    * stage 1 instead of hammering one. */
  def saltedAggregate(df: DataFrame, key: Column, saltBuckets: Int,
      partial: Seq[Column], fin: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy(key.as("_key"), col("_salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("_key"))
      .agg(fin.head, fin.tail: _*)
  }

  /** Convenience: salted sum+count (enough for sum/count/avg rollups). */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      saltBuckets: Int = 16): DataFrame =
    saltedAggregate(df, key, saltBuckets,
      partial = Seq(sum(value).as("_psum"), count(lit(1)).as("_pcnt")),
      fin = Seq(sum(col("_psum")).as("sum"), sum(col("_pcnt")).as("n")))

  /** Salted skew join: replicate the small side `saltBuckets` times and
    * salt the big side's key, so one hot key fans across reducers.
    * Equivalent to `big.join(small, bigKey === smallKey)`. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: Column,
      smallKey: Column, saltBuckets: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedBig.join(replicatedSmall,
      bigKey === smallKey && saltedBig("_salt") === replicatedSmall("_salt"))
      .drop("_salt")
  }

  /** Write a DataFrame as a bucketed+sorted table: joins and
    * aggregations on the bucket key then need NO shuffle (verified by
    * [[isShuffleFreeJoin]]). At warehouse scale this is how the big
    * fact⋈fact joins (q11's shape) drop their exchanges. */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tableName)

  /** Key-skew diagnostic: the top-`topK` keys by row count with each
    * key's exact share in permille — what you run BEFORE a 100 TB join
    * to decide whether a key needs salting. One map-side-combinable
    * count per key, then TakeOrdered for the top slice (never a global
    * window over the full key set — that would serialize millions of
    * keys through one task); the rank window and the broadcast total
    * only ever see ≤ topK + 1 rows. Integer `div` keeps the permille
    * exact on both engines. */
  def keySkew(df: DataFrame, key: Column, topK: Int = 10): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    val top = counts.orderBy(col("n").desc, col("key")).limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("key"))
    top.withColumn("rank", row_number().over(w))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("key"), col("n"),
        expr("CAST((n * 1000) div total AS BIGINT)").as("permille"))
  }

  /** True if the executed join plan contains no shuffle exchange —
    * the co-location check for bucketed joins. */
  def isShuffleFreeJoin(joined: DataFrame): Boolean = {
    joined.queryExecution.toRdd.count() // finalize AQE plan
    !joined.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
  }

  /** Parquet output with files sized near `targetFileBytes` — output
    * file sizing is a first-class concern at 100 TB (thousands of
    * multi-GB files stall readers; millions of KB files stall the
    * metadata layer). Row size is MEASURED, not guessed: a row-capped
    * sample is written to a sizing scratch dir, its on-disk bytes/row
    * (real encoding + compression) derive `maxRecordsPerFile`, and only
    * then does the full single-pass write run. Returns the records/file
    * used.
    *
    * The sample takes the first rows of EVERY partition via a
    * per-partition iterator `take` — each sampling task stops reading
    * after its quota, so the pass costs ~sampleRows of input, not a
    * full scan. Not a `limit()` prefix: a prefix sees only the leading
    * partitions, and a corpus laid out by size (sources sorted by doc
    * length) would yield a per-row estimate off by orders of magnitude
    * in the dangerous direction. Within-partition ordering bias
    * remains — rows later in a partition are never sampled — the usual
    * trade against paying a full extra pass for a uniform sample.
    *
    * Caveats by design: the sample pays parquet's fixed footer/
    * dictionary overhead on few rows, so per-row cost tends to
    * OVERestimate and files land under target (the safe side). A task
    * whose partition holds fewer rows than the cap emits one smaller
    * file — repartition first if partitions ≪ target file count. */
  def writeSizedParquet(df: DataFrame, path: String, targetFileBytes: Long,
      sampleRows: Int = 10000): Long = {
    require(targetFileBytes > 0 && sampleRows > 0)
    val spark = df.sparkSession
    val scratch = new org.apache.hadoop.fs.Path(path + "_sizing")
    val fs = scratch.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rdd = df.rdd
    val nParts = math.max(1, rdd.getNumPartitions)
    val perPartition = math.max(1, (sampleRows.toLong / nParts).toInt)
    // iterator take = early termination per task: upstream reads stop
    // once the quota is met (a filter on mono-id would scan everything)
    spark.createDataFrame(rdd.mapPartitions(_.take(perPartition)), df.schema)
      .write.mode("overwrite").parquet(scratch.toString)
    val sampleBytes = fs.getContentSummary(scratch).getLength
    val sampleCount = spark.read.parquet(scratch.toString).count()
    require(sampleCount > 0, "cannot size output from an empty input")
    val perRow = math.max(1L, sampleBytes / sampleCount)
    val maxRecords = math.max(1L, targetFileBytes / perRow)
    df.write.option("maxRecordsPerFile", maxRecords)
      .mode("overwrite").parquet(path)
    fs.delete(scratch, true)
    maxRecords
  }
}
