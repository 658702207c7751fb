package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the scale-factor multiplier: exact multiplication, intact
  * FK chains, replica-0 identity, and linear (not quadratic) duplicate
  * growth — the properties that make an sf1.0 run generated from sf0.1 an
  * honest scaling measurement rather than an artifact. */
class ScaleUpSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("scaleup-spec", "4").getOrCreate()

  private val src = "/root/testdata/sf0.001"
  private lazy val out: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-scaleup-spec").toString
    graft.tools.ScaleUp.scale(spark, src, d, factor = 3)
    d
  }

  private def t(dir: String, name: String) =
    spark.read.parquet(s"$dir/$name.parquet")

  test("every fact table multiplies exactly; dims copy unchanged") {
    for (n <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings"))
      assert(t(out, n).count() == 3 * t(src, n).count(), n)
    for (n <- Seq("region", "nation"))
      assert(t(out, n).count() == t(src, n).count(), n)
  }

  test("FK chains hold: no orphan orders or lineitems; keys never collide") {
    val orphanOrders = t(out, "orders").join(t(out, "customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(orphanOrders == 0L)
    val orphanItems = t(out, "lineitem").join(t(out, "orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(orphanItems == 0L)
    val docs = t(out, "documents")
    assert(docs.select(col("doc_id")).distinct().count() == docs.count())
  }

  test("replica 0 is byte-identical input data") {
    val origDocs = t(src, "documents")
    val maxId = origDocs.agg(max(col("doc_id"))).head.getLong(0)
    val replica0 = t(out, "documents").filter(col("doc_id") <= maxId)
    assert(replica0.exceptAll(origDocs).count() == 0L)
    assert(origDocs.exceptAll(replica0).count() == 0L)
  }

  test("replica salting keeps duplicate structure linear, not quadratic") {
    // exact-dup cluster count must scale by the factor (each replica
    // carries its own copies), NOT collapse into 3x-deep cross-replica
    // clusters — the salt must make replicas textually distinct
    val srcDups = t(src, "documents").groupBy(md5(col("text")))
      .count().filter(col("count") > 1).count()
    val outDups = t(out, "documents").groupBy(md5(col("text")))
      .count().filter(col("count") > 1).count()
    assert(outDups == 3 * srcDups,
      s"expected ${3 * srcDups} dup clusters (linear), got $outDups")
    // and no text is shared across replicas at all
    val maxId = t(src, "documents").agg(max(col("doc_id"))).head.getLong(0)
    val stride = maxId + 1
    val crossReplica = t(out, "documents")
      .select((col("doc_id") / lit(stride)).cast("long").as("replica"),
        md5(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(countDistinct(col("replica")).as("n_replicas"))
      .filter(col("n_replicas") > 1).count()
    assert(crossReplica == 0L, s"$crossReplica texts shared across replicas")
  }
}
