package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityChecks
import graft.operators.QualityChecks._

/** Table-level constraint suite: exact permille metrics on a
  * hand-built table, vacuous truth on empty denominators, FK orphans.
  */
class QualityChecksSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("quality-checks-spec", "4").getOrCreate()
  import spark.implicits._

  test("suite: hand-computed metrics and verdicts") {
    // 8 rows: k has 1 null (completeness 875); distinct k = {1,2,3,
    // null->excluded? countDistinct ignores null -> 3 of 8 = 375);
    // v in [0,10] for 6 of 8 non-null 8 -> 750; fk: 2 orphans of 7
    // non-null -> 714
    val df = Seq(
      (Option(1L), 5.0, Option(10L)),
      (Option(1L), 5.0, Option(10L)),
      (Option(2L), 11.0, Option(20L)),
      (Option(2L), -1.0, Option(20L)),
      (Option(3L), 0.0, Option(99L)),
      (Option(3L), 10.0, Option(98L)),
      (Option(3L), 3.0, None),
      (Option.empty[Long], 7.0, Option(10L))
    ).toDF("k", "v", "ref_k")
    val ref = Seq(10L, 20L, 30L).toDF("rk")
    val out = QualityChecks.run(df, Seq(
      Completeness("k", minMilli = 900L),
      Uniqueness(Seq("k"), minMilli = 300L),
      InRange("v", 0.0, 10.0, minMilli = 800L),
      RowCountBetween(5L, 10L),
      ForeignKey("ref_k", "ref", ref, "rk", minMilli = 1000L)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(out("completeness(k)") == ((875L, false)))
    assert(out("uniqueness(k)") == ((375L, true)))
    assert(out("in_range(v,0.0,10.0)") == ((750L, false)))
    assert(out("row_count(5,10)") == ((8L, true)))
    // 7 non-null ref_k, orphans 99 and 98 -> 5/7 = 714, fails 1000
    assert(out("foreign_key(ref_k->ref.rk)") == ((714L, false)))
  }

  test("suite: vacuous truth on empty denominators") {
    val empty = Seq.empty[(Option[Long], Double)].toDF("k", "v")
    val ref = Seq(1L).toDF("rk")
    val out = QualityChecks.run(empty, Seq(
      Completeness("k"),
      Uniqueness(Seq("k")),
      InRange("v", 0.0, 1.0),
      RowCountBetween(1L, 10L),
      ForeignKey("k", "ref", ref, "rk")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(out("completeness(k)") == ((1000L, true)))
    assert(out("uniqueness(k)") == ((1000L, true)))
    assert(out("in_range(v,0.0,1.0)") == ((1000L, true)))
    assert(out("row_count(1,10)") == ((0L, false)))
    assert(out("foreign_key(k->ref.rk)") == ((1000L, true)))
    // all-null column: range/FK denominators are 0 -> vacuous, but
    // completeness is 0 and fails
    val nulls = Seq((Option.empty[Long], Option.empty[Double]),
      (Option.empty[Long], Option.empty[Double])).toDF("k", "v")
    val out2 = QualityChecks.run(nulls, Seq(
      Completeness("k"),
      InRange("v", 0.0, 1.0),
      ForeignKey("k", "ref", ref, "rk")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(out2("completeness(k)") == ((0L, false)))
    assert(out2("in_range(v,0.0,1.0)") == ((1000L, true)))
    assert(out2("foreign_key(k->ref.rk)") == ((1000L, true)))
  }

  test("suite: uniqueness is distinctness, and null tuples lower it") {
    // the documented contract (see Uniqueness scaladoc): metric =
    // countDistinct / count(*), i.e. Deequ's DISTINCTNESS — a value
    // appearing twice still counts once in the numerator — and a
    // null-bearing tuple drops from the NUMERATOR only, so nulls
    // strictly lower the metric rather than vacuously passing
    val df = Seq(Option(1L), Option(1L), Option(2L), None, None)
      .toDF("k")
    val out = QualityChecks.run(df, Seq(Uniqueness(Seq("k"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // distinct non-null {1, 2} = 2 over count(*) = 5 -> 400
    assert(out("uniqueness(k)") == 400L, out.toString)
    // Deequ's uniqueness would be 1/5 = 200 here (only 2 occurs once);
    // 400 != 200 is the distinction the scaladoc warns about
    val allNull = Seq(Option.empty[Long], Option.empty[Long]).toDF("k")
    val out2 = QualityChecks.run(allNull, Seq(Uniqueness(Seq("k"))))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(out2("uniqueness(k)") == ((0L, false)), out2.toString)
  }

  test("suite: composite uniqueness distinguishes key from non-key") {
    val df = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)).toDF("a", "b")
    val out = QualityChecks.run(df, Seq(
      Uniqueness(Seq("a")),
      Uniqueness(Seq("a", "b"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("uniqueness(a)") == 500L)
    assert(out("uniqueness(a,b)") == 1000L)
  }

  test("monitor: metric log across batches, drift on degradation, replay idempotent") {
    import graft.streaming.QualityMonitor
    val dir = java.nio.file.Files.createTempDirectory("graft-qmon").toString
    val checks = Seq(
      Completeness("k", minMilli = 900L),
      RowCountBetween(1L, 100L))
    def batch(nulls: Int, rows: Int) =
      ((1 to rows - nulls).map(i => Option(i.toLong)) ++
        Seq.fill(nulls)(Option.empty[Long])).toDF("k")
    // 5 healthy batches (10% nulls), then a degraded one (60% nulls)
    for (b <- 0L to 4L) QualityMonitor.ingest(batch(1, 10), dir, b, checks)
    // replay of batch 3 overwrites its own delta: log row count unchanged
    QualityMonitor.ingest(batch(1, 10), dir, 3L, checks)
    assert(QualityMonitor.history(spark, dir).count() == 5 * 2)
    val calm = QualityMonitor.drift(spark, dir, window = 8, tolMilli = 100L)
      .collect().map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(calm.values.forall(_ == false), s"calm log must not drift: $calm")
    QualityMonitor.ingest(batch(6, 10), dir, 5L, checks)
    val out = QualityMonitor.drift(spark, dir, window = 8, tolMilli = 100L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // completeness 400 vs trailing median 900 -> drifted; row count flat
    assert(out("completeness(k)") == ((400L, 900L, true)), out.toString)
    assert(out("row_count(1,100)") == ((10L, 10L, false)))
    // empty batch still logs (silent feed = loud row_count failure)
    QualityMonitor.ingest(batch(0, 0).limit(0), dir, 6L, checks)
    val last = QualityMonitor.history(spark, dir)
      .filter(org.apache.spark.sql.functions.col("batch_seq") === 6L)
      .collect().map(r => r.getString(1) -> r.getBoolean(3)).toMap
    assert(last("row_count(1,100)") == false)
    assert(last("completeness(k)") == true) // vacuous on 0 rows
  }
}
