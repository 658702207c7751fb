package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{SpaceSavingAgg, SpaceSavingState}
import graft.operators.Sketches

/** Space-saving heavy-hitter guarantees: exact regime == exact counts
  * under ANY partitioning (the mergeability proof), approx-regime
  * error contracts, eviction determinism, serialization round-trip.
  */
class SpaceSavingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("space-saving-spec", "4").getOrCreate()
  import spark.implicits._

  /** A stream with known counts: item_i appears (21 - i) times. */
  private def stream: Seq[String] =
    (1 to 20).flatMap(i => Seq.fill(21 - i)(f"item$i%02d"))

  private def trueCounts: Map[String, Long] =
    stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("exact regime: equals exact counts under adversarial partitioning") {
    // capacity 64 > 20 distinct items ⇒ provably exact, err all 0 —
    // and the result must be identical no matter how rows are split
    // across partitions (partial summaries merge losslessly).
    for (parts <- Seq(1, 7, 32)) {
      val df = scala.util.Random.shuffle(stream).toDF("item")
        .repartition(parts)
        .agg(SpaceSavingAgg.topK(col("item"), 64).as("s"))
        .select(explode(col("s")).as("e"))
        .select(col("e.item"), col("e.est"), col("e.err"))
      val got = df.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.map(g => g._1 -> g._2).toMap == trueCounts,
        s"exact-regime estimates diverged at $parts partitions")
      assert(got.forall(_._3 == 0L), "exact regime must report zero error")
    }
  }

  test("approx regime: classic guarantees hold under partitioned merge") {
    val cap = 4
    // skewed stream so the presence guarantee is NON-vacuous: two items
    // above N/cap = 50 must survive any eviction pattern.
    val stream = Seq.fill(80)("hot1") ++ Seq.fill(60)("hot2") ++
      (1 to 20).flatMap(i => Seq.fill(3)(f"tail$i%02d"))
    val trueCounts = stream.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val n = stream.size
    val df = scala.util.Random.shuffle(stream).toDF("item").repartition(8)
      .agg(SpaceSavingAgg.topK(col("item"), cap).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.item"), col("e.est"), col("e.err"))
    val got = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length <= cap)
    for ((item, est, err) <- got) {
      val t = trueCounts.getOrElse(item, 0L)
      assert(est >= t, s"$item: est $est under-counts true $t")
      assert(est - err <= t, s"$item: est-err ${est - err} exceeds true $t")
    }
    // every item with true > N/cap must be present. With merged partial
    // summaries the bound is sum of per-partial N_i/cap = N/cap.
    val mustHave = trueCounts.filter(_._2 > n.toLong / cap).keySet
    val present = got.map(_._1).toSet
    assert(mustHave.subsetOf(present),
      s"missing guaranteed heavy hitters: ${mustHave -- present}")
  }

  test("eviction is deterministic: min count, ties evict greatest key") {
    val st = new SpaceSavingState(2)
    st.offer("a"); st.offer("b") // a=1, b=1 — full
    st.offer("c") // ties at 1: evict 'b' (greatest key), c = (2, 1)
    assert(st.sortedEntries == Seq(("c", 2L, 1L), ("a", 1L, 0L)))
  }

  test("serialization round-trips entries, capacity and saturation") {
    val st = new SpaceSavingState(2)
    Seq("x", "x", "y", "z").foreach(st.offer) // saturates
    val back = SpaceSavingState.fromBytes(st.toBytes)
    assert(back.capacity == st.capacity)
    assert(back.sortedEntries == st.sortedEntries)
    // merging the deserialized state must behave like the original:
    // saturation (the substitution constant) survives the round trip
    val probe1 = new SpaceSavingState(2)
    probe1.offer("q")
    probe1.mergeIn(back)
    val probe2 = new SpaceSavingState(2)
    probe2.offer("q")
    probe2.mergeIn(st)
    assert(probe1.sortedEntries == probe2.sortedEntries)
  }

  test("merge substitutes the saturated side's min for absent items") {
    // s1 saturated with min count 2; item 'q' absent from s1.
    val s1 = new SpaceSavingState(2)
    Seq("a", "a", "a", "b", "b", "c").foreach(s1.offer)
    // s1: a=3, c=(3,2) after evicting b... verify by invariant below.
    val s2 = new SpaceSavingState(2)
    Seq("q", "q").foreach(s2.offer) // not saturated
    val m1 = s1.sortedEntries.map(_._2).min // s1's min count
    s1.mergeIn(s2)
    val q = s1.sortedEntries.find(_._1 == "q")
    // q's estimate must include s1's substitution (could have counted
    // up to m1 in s1 before eviction) — and that substitution is error.
    q match {
      case Some((_, est, err)) =>
        assert(est == 2L + m1, s"q est $est != 2 + $m1")
        assert(err >= m1)
      case None => // q was trimmed: legal only if every kept estimate >= q's
        assert(s1.sortedEntries.forall(_._2 >= 2L + m1))
    }
  }

  test("streaming: summary state merges across micro-batches (complete mode)") {
    // The aggregate's buffer must serialize into the state store and
    // merge with each micro-batch's partials — the streaming face of
    // mergeability. Exact regime ⇒ after N batches the summary equals
    // the exact running counts.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val q = stream.toDS().toDF("grp", "item")
      .groupBy(col("grp"))
      .agg(SpaceSavingAgg.topK(col("item"), 16).as("s"))
      .writeStream.format("memory").queryName("ss_out")
      .outputMode("complete").start()
    try {
      stream.addData(("g", "a"), ("g", "a"), ("g", "b"))
      q.processAllAvailable()
      def summary(): Seq[(String, Long, Long)] =
        spark.sql("SELECT explode(s) AS e FROM ss_out")
          .select(col("e.item"), col("e.est"), col("e.err"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(summary().toSet == Set(("a", 2L, 0L), ("b", 1L, 0L)))
      stream.addData(("g", "b"), ("g", "b"), ("g", "c"))
      q.processAllAvailable()
      assert(summary().toSet ==
        Set(("a", 2L, 0L), ("b", 3L, 0L), ("c", 1L, 0L)))
    } finally q.stop()
  }

  test("streaming: watermarked event-time windows each carry their own summary") {
    // The windowed form a live heavy-hitter dashboard uses: per
    // 10-minute event-time window, an independent summary; late data
    // beyond the watermark is dropped, in-watermark late data merges
    // into its window's state.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val q = stream.toDS().toDF("t", "item")
      .withWatermark("t", "10 minutes")
      .groupBy(window(col("t"), "10 minutes"), lit(1))
      .agg(SpaceSavingAgg.topK(col("item"), 8).as("s"))
      .writeStream.format("memory").queryName("ss_win_out")
      .outputMode("complete").start()
    try {
      stream.addData(
        (ts("2025-01-01 10:01:00"), "a"), (ts("2025-01-01 10:02:00"), "a"),
        (ts("2025-01-01 10:11:00"), "b"))
      q.processAllAvailable()
      // in-watermark late arrival for the first window
      stream.addData((ts("2025-01-01 10:05:00"), "a"))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT window.start, explode(s) AS e FROM ss_win_out")
        .select(col("start").cast("string"), col("e.item"), col("e.est"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(got == Set(
        ("2025-01-01 10:00:00", "a", 3L),
        ("2025-01-01 10:10:00", "b", 1L)))
    } finally q.stop()
  }

  test("non-string item column fails at analysis, not on executors") {
    val ex = intercept[Exception] {
      Seq(1, 2, 3).toDF("n")
        .agg(SpaceSavingAgg.topK(col("n"), 4)).collect()
    }
    assert(ex.getMessage.contains("STRING"),
      s"expected an analysis-time type error, got: ${ex.getMessage}")
  }

  test("tie-break order is UTF-8 binary — matches Spark's string sort") {
    // U+F900 (BMP, sorts HIGH in UTF-8) vs U+10000 (astral, surrogate
    // pair sorts LOW in UTF-16 code units but HIGH in UTF-8): JVM
    // String order ranks them opposite to UTF-8 binary order.
    val bmp = "豈"
    val astral = new String(Character.toChars(0x10000))
    assert(bmp.compareTo(astral) > 0, "JVM order: bmp above astral")
    assert(graft.functions.Utf8Order.compare(bmp, astral) < 0,
      "UTF-8 order: astral above bmp")
    // the summary's rank order on a count tie must match Spark's own
    // orderBy over the same strings
    val st = new SpaceSavingState(4)
    Seq(astral, bmp).foreach(st.offer)
    val sparkOrder = Seq(bmp, astral).toDF("s").orderBy(col("s").asc)
      .collect().map(_.getString(0)).toSeq
    assert(st.sortedEntries.map(_._1) == sparkOrder)
  }

  test("utf8-order law: code-point compare equals byte-wise UTF-8 compare") {
    // Utf8Order now compares code points without materializing byte
    // arrays (it sits inside the per-eviction min scan); this law holds
    // it equal in SIGN to the byte-wise form it replaced, over random
    // well-formed strings drawn from every UTF-8 length class: ASCII,
    // 2-byte (U+0080..U+07FF), 3-byte incl. the high-BMP U+E000..U+FFFF
    // band where UTF-16 order diverges, and 4-byte supplementary plane.
    def byteCompare(x: String, y: String): Int = {
      val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val c = (a(i) & 0xff) - (b(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      a.length - b.length
    }
    val rnd = new scala.util.Random(131)
    def randCp(): Int = rnd.nextInt(4) match {
      case 0 => 0x20 + rnd.nextInt(0x5f)            // ASCII
      case 1 => 0x80 + rnd.nextInt(0x780)           // 2-byte
      case 2 =>                                      // 3-byte, skip surrogates
        val cp = 0x800 + rnd.nextInt(0xf800)
        if (cp >= 0xd800 && cp <= 0xdfff) 0xe000 + (cp - 0xd800) else cp
      case _ => 0x10000 + rnd.nextInt(0x10000)      // supplementary
    }
    def randStr(): String = {
      val sb = new StringBuilder
      (0 until rnd.nextInt(8)).foreach { _ =>
        // ~1 in 8 units is a LONE surrogate — malformed input the UTF-8
        // encoder replaces with '?'; the order must follow the encoder
        if (rnd.nextInt(8) == 0)
          sb.append((0xd800 + rnd.nextInt(0x800)).toChar)
        else sb.appendAll(Character.toChars(randCp()))
      }
      sb.toString
    }
    for (_ <- 1 to 2000) {
      val (x, y) = (randStr(), randStr())
      assert(Integer.signum(graft.functions.Utf8Order.compare(x, y)) ==
        Integer.signum(byteCompare(x, y)),
        s"order diverged on ${x.map(_.toInt.toHexString)} vs ${y.map(_.toInt.toHexString)}")
    }
  }

  test("heavyHittersTopK: ranked frame shape on a grouped corpus") {
    val docs = Seq(
      ("en", "x x x y z"), ("en", "x y"), ("fr", "a b a")).toDF("lang", "text")
    val out = Sketches.heavyHittersTopK(
      docs.select(col("lang"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("item")),
      "lang", "item", capacity = 16, k = 2).orderBy("lang", "rank").collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(4))).toSeq == Seq(
      ("en", "x", 4L, 1L), ("en", "y", 2L, 2L),
      ("fr", "a", 2L, 1L), ("fr", "b", 1L, 2L)))
  }
}
