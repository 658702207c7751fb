package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TopKAgg, TopKState}
import graft.operators.PrioritySample

/** The bounded-heap grouped top-k aggregate and the priority sampler
  * built on it: window-form equality across partition layouts (the
  * mergeable-summaries claim exercised through real partial/merge
  * paths), heap-state unit laws, the no-window plan shape, and the
  * DLT sampler against an independent sequential witness plus its
  * estimator calibration law. */
class TopKAggSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("topk-spec", "4").getOrCreate()
  import spark.implicits._

  // deterministic pseudo-random rows: 7 groups, colliding scores
  private lazy val rows: Seq[(Long, Long, Long)] = {
    val rnd = new scala.util.Random(42)
    (0L until 5000L).map { id =>
      (rnd.nextInt(7).toLong, id, rnd.nextInt(40).toLong)
    }
  }

  private def windowTopK(k: Int): Set[(Long, Int, Long, Long)] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("s").desc, col("id").asc)
    rows.toDF("g", "id", "s")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1),
        r.getLong(2))).toSet
  }

  private def heapTopK(k: Int, parts: Int): Set[(Long, Int, Long, Long)] =
    rows.toDF("g", "id", "s").repartition(parts)
      .groupBy(col("g")).agg(TopKAgg.topK(col("s"), col("id"), k).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).cast("int").as("rank"),
        col("e.id").as("id"), col("e.score").as("s"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet

  test("topk_heap equals the window form across partition layouts") {
    val want = windowTopK(12)
    // 1 partition (update only) and 13 (real partial/merge traffic)
    assert(heapTopK(12, 1) == want)
    assert(heapTopK(12, 13) == want)
  }

  test("topk_heap: ties break id-ascending; k > group size returns all") {
    val df = Seq((0L, 7L, 5L), (0L, 3L, 5L), (0L, 9L, 5L), (0L, 1L, 2L))
      .toDF("g", "id", "s")
    val got = df.groupBy(col("g"))
      .agg(TopKAgg.topK(col("s"), col("id"), 3).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.id")).as[Long].collect().toSeq
    assert(got == Seq(3L, 7L, 9L)) // score 5 three-way tie: id asc
    val all = df.groupBy(col("g"))
      .agg(TopKAgg.topK(col("s"), col("id"), 100).as("tk"))
      .select(size(col("tk"))).as[Int].head()
    assert(all == 4)
  }

  test("topk_heap ignores null scores/ids") {
    val df = Seq((Some(0L), Some(10L), Some(9L)), (Some(0L), Some(11L), None),
      (Some(0L), None, Some(99L)), (Some(0L), Some(12L), Some(1L)))
      .toDF("g", "id", "s")
    val got = df.groupBy(col("g"))
      .agg(TopKAgg.topK(col("s"), col("id"), 2).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.id")).as[Long].collect().toSeq
    assert(got == Seq(10L, 12L))
  }

  test("TopKState: eviction order, merge, serde round-trip") {
    val st = new TopKState(3)
    Seq((5L, 1L), (3L, 2L), (8L, 3L), (3L, 0L), (9L, 4L)).foreach {
      case (s, i) => st.offer(s, i)
    }
    // survivors of k=3: 9,8,5 (both 3-score entries evicted)
    assert(st.sortedEntries == Seq((9L, 4L), (8L, 3L), (5L, 1L)))
    val other = new TopKState(3)
    Seq((7L, 9L), (9L, 0L)).foreach { case (s, i) => other.offer(s, i) }
    st.mergeIn(other)
    // merged top-3: (9,0) beats (9,4) on id; 8 keeps third
    assert(st.sortedEntries == Seq((9L, 0L), (9L, 4L), (8L, 3L)))
    val back = TopKState.fromBytes(st.toBytes)
    assert(back.sortedEntries == st.sortedEntries && back.k == st.k)
  }

  test("TopKState: Long.MinValue score ranks LAST (window-form parity)") {
    val st = new TopKState(3)
    Seq((Long.MinValue, 1L), (0L, 2L), (5L, 3L)).foreach {
      case (s, i) => st.offer(s, i)
    }
    // −MinValue == MinValue, so a negation-keyed sort would rank it first
    assert(st.sortedEntries ==
      Seq((5L, 3L), (0L, 2L), (Long.MinValue, 1L)))
  }

  test("plan shape: partial ObjectHashAggregate, no Window, no Sort") {
    val plan = rows.toDF("g", "id", "s").repartition(8)
      .groupBy(col("g")).agg(TopKAgg.topK(col("s"), col("id"), 5).as("tk"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.toLowerCase.contains("partial_topk_heap"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort "), plan)
  }

  // --- priority sampling on top of the heap aggregate ---

  /** Sequential witness: the whole DLT derivation with plain Scala —
    * java MessageDigest md5, BigInt hex parse, sorting — no Spark. */
  private def witnessSample(items: Seq[(String, Long, Long)], k: Int)
      : Seq[(String, Int, Long, Long, Long, Option[Long], Long)] = {
    def h60(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"ps:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      BigInt(hex.take(15), 16).toLong
    }
    items.groupBy(_._1).toSeq.flatMap { case (g, its) =>
      val ranked = its.map { case (_, id, w) =>
        val pr = (w * 1099511627776L) / (h60(id) / 1048576L + 1L)
        (id, w, pr)
      }.sortBy { case (id, _, pr) => (-pr, id) }
      val tau = ranked.lift(k).map(_._3)
      ranked.take(k).zipWithIndex.map { case ((id, w, pr), ix) =>
        val est = tau.fold(w)(t => math.max(w, t))
        (g, ix + 1, id, w, pr, tau, est)
      }
    }.sortBy { case (g, r, _, _, _, _, _) => (g, r) }
  }

  private lazy val sampleItems: Seq[(String, Long, Long)] = {
    val rnd = new scala.util.Random(7)
    // group sizes straddle k: g0 tiny (exact regime), others large
    (0L until 2000L).map { id =>
      val g = if (id < 4) "g0" else s"g${1 + (id % 5)}"
      (g, id, 10L + rnd.nextInt(500).toLong)
    }
  }

  test("prioritySample equals the sequential witness") {
    val k = 8
    val got = PrioritySample.sample(
      sampleItems.toDF("src", "item", "wt"), k, "src", "item", "wt")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)), r.getLong(6)))
      .sortBy { case (g, rk, _, _, _, _, _) => (g, rk) }.toSeq
    assert(got == witnessSample(sampleItems, k))
  }

  test("prioritySample: exact regime — small group keeps all, est == w") {
    val out = PrioritySample.sample(
      sampleItems.toDF("src", "item", "wt"), 8, "src", "item", "wt")
      .filter(col("grp") === "g0").collect()
    assert(out.length == 4)
    assert(out.forall(_.isNullAt(5)))
    assert(out.forall(r => r.getLong(6) == r.getLong(3)))
  }

  test("prioritySample: DLT estimator calibrates to the group total") {
    val items = sampleItems.filter(_._1 == "g1")
    val trueTotal = items.map(_._3).sum
    val est = PrioritySample.sample(
      items.toDF("src", "item", "wt"), 64, "src", "item", "wt")
      .agg(sum(col("est"))).head().getLong(0).toDouble
    // DLT: relative std ~ 1/sqrt(k-2) ≈ 13% at k=64; deterministic
    // here (hash-driven), pinned with headroom
    assert(math.abs(est - trueTotal) <= 0.20 * trueTotal,
      s"est $est vs true $trueTotal")
  }

  test("prioritySample: weight at/above 2^22 fails loudly, never wraps") {
    val items = Seq(("g", 1L, 5L), ("g", 2L, 1L << 22))
    val e = intercept[Exception] {
      PrioritySample.sample(
        items.toDF("src", "item", "wt"), 1, "src", "item", "wt").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("overflow int64")), e.toString)
  }

  test("estimate: a u40=1-extreme priority survives as est without wrap") {
    // hand-built topState frame: τ = pr at rank k+1 near the w·2^40
    // ceiling (the forced u40 = 1 draw) — est = max(w, τ) must carry it
    // exactly; the retired ·1000 scaling wrapped negative here
    val hugePr = ((1L << 22) - 1L) * (1L << 40) // max legal priority
    val state = Seq(
      ("g", 1, 10L, 7L, hugePr),
      ("g", 2, 11L, 3L, hugePr - 1L))
      .toDF("grp", "rank", "id", "w", "pr")
    val out = PrioritySample.estimate(state, 1).collect()
    assert(out.length == 1)
    assert(out.head.getLong(6) == hugePr - 1L) // est = τ, exact
    assert(out.head.getLong(6) > 0L)
  }
}
