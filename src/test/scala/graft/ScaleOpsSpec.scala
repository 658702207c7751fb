package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.ScaleOps

/** Skew salting correctness + bucketed co-located join (no-shuffle plan). */
class ScaleOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    graft.core.GraftSession.builder("scaleops-spec", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      .getOrCreate()
  }

  /** getOrCreate() may hand back another suite's session whose warehouse
    * already holds a previous run's table — drop from the catalog AND
    * delete the location, or the CTAS dies with LOCATION_ALREADY_EXISTS
    * on any rerun from a dirty worktree. */
  private def dropBucketedTables(names: String*): Unit = names.foreach { name =>
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val loc = new java.io.File(wh, name)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
  }

  test("salted aggregation equals plain aggregation (skewed key)") {
    val li = graft.core.Tables(spark, "/root/testdata/sf0.001").lineitem
    val plain = li.groupBy(col("l_returnflag").as("_key"))
      .agg(sum(col("l_quantity")).as("sum"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = ScaleOps.saltedSumCount(li, col("l_returnflag"),
        col("l_quantity"), saltBuckets = 16)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // sums of doubles: compare with tolerance (salting changes add order)
    assert(plain.keySet == salted.keySet)
    plain.foreach { case (k, (s, n)) =>
      assert(math.abs(salted(k)._1 - s) < 1e-6 && salted(k)._2 == n)
    }
  }

  test("salted join equals plain join") {
    val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
    val plain = t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .count()
    val salted = ScaleOps.saltedJoin(t.lineitem, t.orders,
      col("l_orderkey"), col("o_orderkey")).count()
    assert(plain == salted)
  }

  test("bucketed tables join without a shuffle exchange") {
    val t = graft.core.Tables(spark, "/root/testdata/sf0.001")
    // the check distinguishes co-location from broadcast: disable
    // broadcast at runtime (the builder conf is ignored when getOrCreate
    // returns another suite's session)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    dropBucketedTables("li_bucketed", "o_bucketed")
    ScaleOps.writeBucketed(t.lineitem, "li_bucketed", "l_orderkey", 8)
    ScaleOps.writeBucketed(t.orders, "o_bucketed", "o_orderkey", 8)
    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
    assert(ScaleOps.isShuffleFreeJoin(joined),
      "bucketed join should have no hash-partitioning exchange")
    // and the unbucketed equivalent DOES shuffle (sanity of the check)
    val unbucketed = t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey"))
    assert(!ScaleOps.isShuffleFreeJoin(unbucketed))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("funnel over a user-bucketed events table pays ZERO hash exchanges") {
    import graft.operators.Funnel
    val steps = Seq(
      "view" -> (col("event_type") === "view"),
      "click" -> (col("event_type") === "click"),
      "purchase" -> (col("event_type") === "purchase"))
    val ev = graft.core.Tables(spark, "/root/testdata/sf0.001").events
      .select(col("user_id"), col("ts"), col("event_type"))
    // the SCALE claim behind q92: every funnel stage keys on user_id, so
    // a user-bucketed event table satisfies every distribution requirement
    // from the scan — k chained agg+join steps, ZERO shuffles (this
    // session has broadcasts disabled, so bucketing alone carries it)
    dropBucketedTables("ev_funnel_bucketed")
    ScaleOps.writeBucketed(ev, "ev_funnel_bucketed", "user_id", 8)
    val f = Funnel.funnel(spark.table("ev_funnel_bucketed"), "user_id", "ts", steps)
    f.queryExecution.toRdd.count()
    val fPlan = f.queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(fPlan).size
    assert(n == 0, s"bucketed funnel should pay zero hash exchanges, got $n")
    // sanity of the check: the unbucketed frame DOES shuffle
    val g = Funnel.funnel(ev, "user_id", "ts", steps)
    g.queryExecution.toRdd.count()
    assert("Exchange hashpartitioning".r
      .findAllIn(g.queryExecution.executedPlan.toString).nonEmpty)
    // and the results agree (bucketing is layout, not semantics)
    assert(f.orderBy(col("user_id")).collect().toSeq ==
      g.orderBy(col("user_id")).collect().toSeq)
  }

  test("sized parquet output: files land near target, data intact") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-sized").toString + "/t"
    // md5 payloads: incompressible, so measured bytes/row is honest
    // (constant strings RLE away to ~nothing and nothing would split)
    val df = (1L to 20000L).map(i =>
      (i, java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes).map("%02x".format(_)).mkString * 4))
      .toDF("id", "payload")
      .repartition(2) // few fat partitions: the cap must split them
    val maxRecords = ScaleOps.writeSizedParquet(df, out, targetFileBytes = 64 * 1024)
    assert(maxRecords > 0)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    assert(files.length > 2, s"cap should split the 2 partitions, got ${files.length}")
    // no file wildly over target (sample overestimates per-row cost, so
    // files land under; 2x headroom allows footer variance)
    files.foreach(f => assert(f.length() < 2 * 64 * 1024,
      s"${f.getName} is ${f.length()} bytes"))
    // round-trip intact
    val back = spark.read.parquet(out)
    assert(back.count() == 20000L)
    assert(back.agg(sum(col("id"))).head.getLong(0) == (1L to 20000L).sum)
    // scratch dir cleaned up
    assert(!new java.io.File(out + "_sizing").exists())
  }

  test("morton code round-trips and stays within 2*bits") {
    import spark.implicits._
    import graft.operators.Layout
    val rng = new scala.util.Random(7)
    val rows = (1 to 500).map(_ =>
      (rng.nextInt(1 << 21).toLong, rng.nextInt(1 << 21).toLong))
      .toDF("a", "b")
    val got = rows.select(col("a"), col("b"),
      Layout.mortonCode(col("a"), col("b")).as("z"))
      .select(col("a"), col("b"), col("z"),
        Layout.mortonDecode(col("z"), 0).as("da"),
        Layout.mortonDecode(col("z"), 1).as("db"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(0) == r.getLong(3) && r.getLong(1) == r.getLong(4),
        s"round-trip: $r")
      assert(r.getLong(2) >= 0 && r.getLong(2) < (1L << 42), s"range: $r")
    }
  }

  test("3-dim morton round-trips and agrees with the 2-dim form") {
    import spark.implicits._
    import graft.operators.Layout
    val rng = new scala.util.Random(13)
    val rows = (1 to 300).map(_ => (rng.nextInt(1 << 12).toLong,
      rng.nextInt(1 << 12).toLong, rng.nextInt(1 << 12).toLong))
      .toDF("a", "b", "c")
    val got = rows.select(col("a"), col("b"), col("c"),
      Layout.mortonCodeN(Seq(col("a"), col("b"), col("c")), 12).as("z"),
      Layout.mortonCode(col("a"), col("b"), 12).as("z2"),
      Layout.mortonCodeN(Seq(col("a"), col("b")), 12).as("z2n"))
      .select(col("a"), col("b"), col("c"), col("z2"), col("z2n"),
        Layout.mortonDecodeN(col("z"), 0, 3, 12).as("da"),
        Layout.mortonDecodeN(col("z"), 1, 3, 12).as("db"),
        Layout.mortonDecodeN(col("z"), 2, 3, 12).as("dc"))
      .collect()
    got.foreach { r =>
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
        ((r.getLong(5), r.getLong(6), r.getLong(7))), s"round-trip: $r")
      assert(r.getLong(3) == r.getLong(4), s"2-dim forms agree: $r")
    }
  }

  test("morton validate: negative dimension fails fast; z-writer validates") {
    import spark.implicits._
    import graft.operators.Layout
    val bad = Seq((3L, -2L)).toDF("a", "b")
    // unvalidated: the documented low-bits contract silently interleaves
    // two's-complement bits — the hazard the validate flag exists for
    assert(bad.select(Layout.mortonCode(col("a"), col("b"), 8)).head.getLong(0) >= 0)
    val ex = intercept[Exception] {
      bad.select(Layout.mortonCode(col("a"), col("b"), 8, validate = true)).collect()
    }
    assert(exMessageChain(ex).contains("mortonCodeN: negative dimension"),
      exMessageChain(ex))
    // the writer validates by default: corrupt layout must not reach disk
    val out = java.nio.file.Files.createTempDirectory("graft-zneg").toString + "/t"
    val wex = intercept[Exception] {
      Layout.zorderWriteN(bad, Seq(col("a"), col("b")), out, numFiles = 2, bits = 8)
    }
    assert(exMessageChain(wex).contains("mortonCodeN: negative dimension"),
      exMessageChain(wex))
    // nulls still propagate to a null code (validation must not eat them)
    val nullRow = spark.sql("SELECT CAST(NULL AS BIGINT) AS a, 5L AS b")
      .select(Layout.mortonCode(col("a"), col("b"), 8, validate = true).as("z"))
      .head()
    assert(nullRow.isNullAt(0))
  }

  private def exMessageChain(e: Throwable): String = {
    val sb = new StringBuilder
    var cur = e
    while (cur != null) { sb.append(cur.getMessage).append(" | "); cur = cur.getCause }
    sb.toString
  }

  /** repartitionByRange draws reservoir samples seeded by the RDD id,
    * so zorderWrite's range boundaries depend on how many RDDs the
    * shared session created BEFORE the test — fine in production
    * (any sample gives z-contiguous files), but it made the two
    * layout tests suite-order-dependent: exact quadrant tiling
    * standalone, smeared boundaries (and a flaked threshold) when 40
    * suites ran first. An exhaustive sample (size ≥ rows/partition)
    * makes the boundaries the exact quantiles — deterministic
    * regardless of rdd.id — while still exercising the real writer. */
  private def withExactRangeBoundaries[A](body: => A): A = {
    val key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "100000")
    try body finally spark.conf.set(key, prev)
  }

  test("z-order read side: selective filters skip most data on BOTH dims") {
    withExactRangeBoundaries {
    import graft.operators.Layout
    val base = java.nio.file.Files.createTempDirectory("graft-zskip").toString
    val grid = spark.range(256L * 256L)
      .select((col("id") / 256).cast("long").as("x"), (col("id") % 256).as("y"))
      .repartition(8)
    val total = 256L * 256L
    Layout.zorderWrite(grid, col("x"), col("y"), base + "/z", numFiles = 16, bits = 8)
    // rows EMITTED by the parquet scan = rows of row groups/pages that
    // survived min/max skipping under the pushed filter — the actual
    // read-side win, measured from the scan's own metrics
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.queryExecution.toRdd.count()
      df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.map(_.metrics("numOutputRows").value).sum
    }
    // 16 z-files tile the grid in ~64x64 blocks: a point filter on either
    // dim intersects ~one block-row/column ≈ 25% of the data (sampled
    // range boundaries smear the tiling a bit — allow 45%, still nowhere
    // near the 100% a mis-sorted layout pays)
    val zx = scanRows(spark.read.parquet(base + "/z").filter(col("x") === 17))
    val zy = scanRows(spark.read.parquet(base + "/z").filter(col("y") === 200))
    assert(zx <= total * 45 / 100, s"x-filter scanned $zx of $total rows")
    assert(zy <= total * 45 / 100, s"y-filter scanned $zy of $total rows")
    // the failure mode z-order exists to fix: sort by x ONLY, and a
    // y-filter's stats ranges cover everything — no skipping at all
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(base + "/xsorted")
    val sy = scanRows(spark.read.parquet(base + "/xsorted").filter(col("y") === 200))
    assert(sy >= total * 95 / 100, s"expected ~full scan, got $sy of $total")
    // file-level view of the same proof: count files whose min/max range
    // on the filtered dim contains the literal — both dims prune most
    val stats = spark.read.parquet(base + "/z")
      .groupBy(input_file_name().as("f"))
      .agg(min(col("x")).as("minx"), max(col("x")).as("maxx"),
        min(col("y")).as("miny"), max(col("y")).as("maxy"))
      .collect()
    val nFiles = stats.length
    val xHit = stats.count(r => r.getLong(1) <= 17 && 17 <= r.getLong(2))
    val yHit = stats.count(r => r.getLong(3) <= 200 && 200 <= r.getLong(4))
    assert(xHit < nFiles / 2, s"x=17 hits $xHit of $nFiles files")
    assert(yHit < nFiles / 2, s"y=200 hits $yHit of $nFiles files")
    }
  }

  test("zorderWrite keeps BOTH dims' per-file extents narrow") {
    withExactRangeBoundaries {
    import spark.implicits._
    import graft.operators.Layout
    val out = java.nio.file.Files.createTempDirectory("graft-z").toString + "/t"
    // full 256x256 grid, shuffled input order
    val grid = spark.range(256L * 256L)
      .select((col("id") / 256).cast("long").as("x"), (col("id") % 256).as("y"))
      .repartition(8)
    Layout.zorderWrite(grid, col("x"), col("y"), out, numFiles = 16, bits = 8)
    val extents = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg((max(col("x")) - min(col("x"))).as("ex"),
        (max(col("y")) - min(col("y"))).as("ey"))
      .collect()
    assert(extents.length >= 8, s"expected >=8 files, got ${extents.length}")
    // 16 z-contiguous blocks of a 256x256 grid sit in ~64x64 quadrant
    // regions; sampled range boundaries can straddle two, so allow 2x64
    // plus slack — but far below 255, which is what every file would
    // show on the non-sorted dim of a single-column sort
    val avgX = extents.map(_.getLong(1)).sum.toDouble / extents.length
    val avgY = extents.map(_.getLong(2)).sum.toDouble / extents.length
    assert(avgX < 192, s"avg x-extent $avgX")
    assert(avgY < 192, s"avg y-extent $avgY")
    }
  }

  test("skipping report: zorder prunes a 2-D box better than linear; counts exact") {
    import spark.implicits._
    import graft.operators.Layout
    // uniform 64x64 grid, one row per cell: every count is analytic
    val grid = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b))
      .toDF("a", "b")
    val out = Layout.skippingReport(grid, col("a"), col("b"),
      bits = 6, buckets = 16, aLo = 16L, aHi = 23L, bLo = 16L, bHi = 23L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    val (lUsed, lHit, lTot, lScan, lMatch) = out("linear_a")
    val (zUsed, zHit, zTot, zScan, zMatch) = out("zorder_ab")
    // both layouts answer the same query on the same rows
    assert(lTot == 4096L && zTot == 4096L)
    assert(lMatch == 64L && zMatch == 64L, s"8x8 box: $lMatch/$zMatch")
    // linear on a: buckets are a-ranges of width 4 -> the 8-wide a-box
    // hits exactly 2 buckets, but each carries ALL b values: 512 rows
    assert(lUsed == 16L && lHit == 2L && lScan == 512L, out("linear_a").toString)
    // zorder: 16 equal-width z-buckets are 16x16 quadrants; the aligned
    // 8x8 box sits inside ONE quadrant: 256 rows — half the linear scan
    assert(zUsed == 16L && zHit == 1L && zScan == 256L, out("zorder_ab").toString)
    assert(zScan < lScan)
  }

  test("skipping report: refuses shapes whose bucket product overflows; validates dims") {
    import spark.implicits._
    import graft.operators.Layout
    val df = Seq((1L, 2L)).toDF("a", "b")
    // 2*31 + log2(1024) > 62: the z*buckets long product would wrap
    val ex = intercept[IllegalArgumentException] {
      Layout.skippingReport(df, col("a"), col("b"), bits = 31,
        buckets = 1024, aLo = 0L, aHi = 1L, bLo = 0L, bHi = 1L)
    }
    assert(ex.getMessage.contains("overflow"), ex.getMessage)
    // out-of-range dimension values fail the task: negative, and ALSO
    // >= 2^bits (the z code would use low bits while the linear layout
    // buckets the raw value — two layouts describing different data)
    for (bad <- Seq(-1L, 1L << 8)) {
      val neg = Seq((bad, 2L)).toDF("a", "b")
      val nex = intercept[Exception] {
        Layout.skippingReport(neg, col("a"), col("b"), bits = 8,
          buckets = 16, aLo = 0L, aHi = 1L, bLo = 0L, bHi = 1L)
      }
      assert(exMessageChain(nex).contains("outside [0, 2^8)"),
        s"dim $bad: ${exMessageChain(nex)}")
    }
    // exact power-of-two buckets multiply by exactly log2: bits=26,
    // buckets=1024 has max product < 2^62 and must be ACCEPTED
    val ok = Seq((1L, 2L)).toDF("a", "b")
    assert(Layout.skippingReport(ok, col("a"), col("b"), bits = 26,
      buckets = 1024, aLo = 0L, aHi = 1L, bLo = 0L, bHi = 1L)
      .count() == 2)
  }
}
