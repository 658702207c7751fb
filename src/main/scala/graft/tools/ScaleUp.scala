package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for the driver's synthetic tables.
  *
  * Reads `srcDir` (e.g. sf0.1) and writes `factor`x the data to `outDir`
  * (e.g. an sf1.0-equivalent), preserving the generator's distributions
  * and referential integrity:
  *
  *   - Dimension tables (`region`, `nation`) are fixed-cardinality in
  *     TPC-H and are copied as-is.
  *   - Every fact/entity table is replicated `factor` times with each
  *     replica's keys offset by a per-key-family stride (max key + 1), so
  *     FK chains (orders.o_custkey -> customer.c_custkey,
  *     lineitem.l_orderkey -> orders.o_orderkey, ...) stay intact inside
  *     each replica and never collide across replicas.
  *   - `documents.text` in replicas >= 1 gets a deterministic
  *     replica-specific salt appended to every 7th word. Rationale: the
  *     duplicate-detection operators (MinHash-LSH over 8-word shingles,
  *     SimHash, n-gram Jaccard) must see 10x MORE data, not the SAME data
  *     10 times — un-salted replicas would make every document a 10-way
  *     cross-replica near-duplicate and quadratically inflate pair counts,
  *     which measures an artifact, not scaling. Salting every 7th word
  *     puts at least one changed token in every 8-word shingle window, so
  *     within-replica duplicate structure is preserved exactly and
  *     cross-replica pairs vanish: pair counts scale linearly, as a real
  *     10x corpus crawl would.
  *   - `embeddings.embedding` in replicas >= 1 gets a deterministic
  *     +-5e-5 per-dimension jitter: cluster geometry is preserved (the
  *     synthetic clusters are separated by O(1e-1)) but exact vector ties
  *     across replicas are broken, so ANN/semantic-dedup see 10x distinct
  *     points rather than 10-way degenerate ties.
  *   - `events.ts` is TIMESTAMP(NANOS) in the source parquet (read as
  *     Long under nanosAsLong); it is rewritten as micro-precision
  *     TimestampType — the same truncation `Tables.events` applies — so
  *     both Spark and the DuckDB oracle read the scaled table with plain
  *     timestamp semantics.
  *
  * Replica 0 is ALWAYS byte-identical input data (keys unshifted), so
  * every sf0.1 query result is a subset of the scaled run's input.
  *
  * Usage: ScaleUp <srcDir> <outDir> [factor=10]
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = graft.core.GraftSession.get("graft-scaleup")
    scale(spark, srcDir, outDir, factor)
    spark.stop()
  }

  def scale(spark: SparkSession, srcDir: String, outDir: String, factor: Int): Unit = {
    def read(name: String): DataFrame = spark.read.parquet(s"$srcDir/$name.parquet")
    // Single-FILE parquet per table (the driver's testdata convention, and
    // what DuckDB's read_parquet('<t>.parquet') expects) with 8 MiB row
    // groups so a Spark scan still splits one file across many tasks.
    def write(df: DataFrame, name: String): Unit = {
      val tmp = s"$outDir/.tmp_$name"
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", (8 * 1024 * 1024).toString)
        .parquet(tmp)
      val tmpDir = new java.io.File(tmp)
      val part = tmpDir.listFiles().find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet part written for $name"))
      val target = new java.io.File(s"$outDir/$name.parquet")
      if (target.exists()) target.delete()
      java.nio.file.Files.move(part.toPath, target.toPath)
      tmpDir.listFiles().foreach(_.delete()); tmpDir.delete()
    }

    // Per-key-family stride = max(key) + 1 — driver-scale scalars, one
    // cheap column-pruned scan each.
    def stride(df: DataFrame, col: String): Long =
      df.agg(max(col)).head.getLong(0) + 1L

    val customer = read("customer")
    val supplier = read("supplier")
    val part     = read("part")
    val orders   = read("orders")
    val lineitem = read("lineitem")
    val events   = read("events")
    val docs     = read("documents")
    val embs     = read("embeddings")

    val cS = stride(customer, "c_custkey")
    val sS = stride(supplier, "s_suppkey")
    val pS = stride(part, "p_partkey")
    val oS = stride(orders, "o_orderkey")
    val eS = stride(events, "event_id")
    val uS = stride(events, "user_id")
    val dS = stride(docs, "doc_id")
    val vS = stride(embs, "vec_id")

    def replicate(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => shift(df, i)).reduce(_ unionAll _)

    // fixed dims: copy as-is
    write(read("region"), "region")
    write(read("nation"), "nation")

    write(replicate(customer) { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i.toLong * cS))
    }, "customer")

    write(replicate(supplier) { (df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i.toLong * sS))
    }, "supplier")

    write(replicate(part) { (df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i.toLong * pS))
    }, "part")

    write(replicate(orders) { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * oS))
        .withColumn("o_custkey", col("o_custkey") + lit(i.toLong * cS))
    }, "orders")

    write(replicate(lineitem) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * oS))
        .withColumn("l_partkey", col("l_partkey") + lit(i.toLong * pS))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i.toLong * sS))
    }, "lineitem")

    // events: ts arrives as Long nanos (nanosAsLong); emit micro-precision
    // timestamps so the scaled parquet is a plain TIMESTAMP column for both
    // Spark and DuckDB.
    val eventsTs =
      if (events.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        events.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else events
    write(replicate(eventsTs) { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i.toLong * eS))
        .withColumn("user_id", col("user_id") + lit(i.toLong * uS))
    }, "events")

    write(replicate(docs) { (df, i) =>
      val salted =
        if (i == 0) df
        else df
          .withColumn("text", expr(
            s"concat_ws(' ', transform(split(text, ' '), (w, j) -> IF(j % 7 = 3, concat(w, 'q$i'), w)))"))
          .withColumn("n_chars", length(col("text")).cast("long"))
      salted.withColumn("doc_id", col("doc_id") + lit(i.toLong * dS))
    }, "documents")

    write(replicate(embs) { (df, i) =>
      val jittered =
        if (i == 0) df
        else df.withColumn("embedding", expr(
          s"transform(embedding, (x, j) -> cast(x + (((j * 31 + $i * 131) % 97) - 48) * 1.0e-6 as float))"))
      jittered.withColumn("vec_id", col("vec_id") + lit(i.toLong * vS))
    }, "embeddings")
  }
}
