package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pq

/** Product-quantization invariants: the joint distributed build equals
  * the sequential witness bitwise; ADC scoring is exactly the table
  * arithmetic; the job count is round-shaped (independent of corpus
  * size AND of m and k — the property that makes production k = 256
  * affordable). */
class PqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("pq-spec", "4").getOrCreate()
  import spark.implicits._

  private def randomVecs(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong * 3 + 1, Array.fill(dim)((rnd.nextInt(2000) - 1000) / 997.0)))
  }

  test("build law: distributed == sequential witness (codebooks bitwise, codes equal)") {
    implicit val s: SparkSession = spark
    val rnd = new scala.util.Random(149L)
    for (trial <- 1 to 3) {
      val m = Seq(2, 4)(rnd.nextInt(2))
      val dim = m * (2 + rnd.nextInt(3))
      val k = 3 + rnd.nextInt(4)
      val iters = 1 + rnd.nextInt(3)
      val vecs = randomVecs(20 + k + rnd.nextInt(30), dim, 1000 + trial)
      val df = vecs.map { case (id, v) => (id, v.toSeq) }
        .toDF("vec_id", "embedding")
      val model = Pq.train(df, m, k, iters = iters)
      val (witCbs, witCodes) = Pq.trainWitness(vecs, m, k, iters)
      for (sub <- 0 until m; c <- 0 until k)
        assert(model.codebooks(sub)(c).sameElements(witCbs(sub)(c)),
          s"trial $trial (m=$m k=$k iters=$iters) codebook ($sub,$c) diverged")
      val engCodes = Pq.encode(df, model).orderBy(col("id")).collect()
        .map(r => (r.getLong(0), r.getSeq[Byte](1).toArray))
      assert(engCodes.length == witCodes.length)
      engCodes.zip(witCodes).foreach { case ((ei, ec), (wi, wc)) =>
        assert(ei == wi && ec.sameElements(wc),
          s"trial $trial codes diverged at id $ei/$wi")
      }
    }
  }

  test("ADC score is exactly the subdistance-table sum; top-k deterministic") {
    implicit val s: SparkSession = spark
    val vecs = randomVecs(60, 8, 7L)
    val df = vecs.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val model = Pq.train(df, m = 4, k = 4, iters = 2)
    val codes = Pq.encode(df, model)
    val top = Pq.adcTopK(df.filter(col("vec_id") < 10), codes, model, kTop = 5)
      .collect()
    assert(top.nonEmpty)
    val byId = vecs.toMap
    val codeById = Pq.encode(df, model).collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1).toArray).toMap
    val dsub = model.dim / model.m
    top.foreach { r =>
      val (qid, nid, got) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(qid != nid, "self-match must be excluded")
      // recompute with the kernel's exact ASSOCIATION: a per-sub
      // subtotal (the table entry), then the m subtotals summed
      // ascending — one flat accumulator across all m×dsub terms
      // differs in the last ulp and the contract is the table form
      val qv = byId(qid)
      var acc = 0.0
      for (sub <- 0 until model.m) {
        val cw = model.codebooks(sub)(codeById(nid)(sub) & 0xFF)
        var entry = 0.0
        var i = 0
        while (i < dsub) {
          val d = qv(sub * dsub + i) - cw(i); entry += d * d; i += 1
        }
        acc += entry
      }
      assert(acc == got, s"ADC mismatch for ($qid,$nid): $acc vs $got")
    }
    // ranks are 1..5 per query, strictly ordered by (dist, id)
    top.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to sorted.length))
      sorted.sliding(2).filter(_.length == 2).foreach { pair =>
        val (a, b) = (pair(0), pair(1))
        assert(a.getDouble(2) < b.getDouble(2) ||
          (a.getDouble(2) == b.getDouble(2) && a.getLong(1) < b.getLong(1)))
      }
    }
  }

  test("train cost is round-shaped: jobs independent of corpus size, m, AND k") {
    implicit val s: SparkSession = spark
    def df(n: Int) = randomVecs(n, 8, 11L)
      .map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    def jobsFor(d: org.apache.spark.sql.DataFrame, m: Int, k: Int,
        iters: Int, tag: String): Int = {
      val sc = spark.sparkContext
      sc.setJobGroup(tag, tag, interruptOnCancel = false)
      try Pq.train(d, m, k, iters = iters)
      finally sc.clearJobGroup()
      sc.statusTracker.getJobIdsForGroup(tag).length
    }
    val baseJobs = jobsFor(df(40), 4, 8, 3, "pq-base")
    assert(jobsFor(df(200), 4, 8, 3, "pq-big") == baseJobs,
      "job count is data-shaped")
    assert(jobsFor(df(40), 8, 8, 3, "pq-m8") == baseJobs,
      "job count depends on m — the joint build's whole point")
    assert(jobsFor(df(40), 4, 16, 3, "pq-k16") == baseJobs,
      "job count depends on k — production k=256 must not pay barriers")
    val moreIters = jobsFor(df(40), 4, 8, 6, "pq-it6")
    assert(moreIters > baseJobs, "iters should add jobs")
    info(s"jobs: base(m=4,k=8,iters=3)=$baseJobs, iters=6: $moreIters")
  }

  test("ivfpq: nprobe == nlist degenerates to the full ADC ranking") {
    // the IvfAnn nprobe==nlist invariant transplanted to the composed
    // layout: probing every list must reproduce the plain whole-corpus
    // ADC top-k exactly (same dists, same ranks)
    implicit val s: SparkSession = spark
    import graft.operators.IvfAnn
    val vecs = randomVecs(80, 8, 21L)
    val df = vecs.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 12)
    val idx = IvfAnn.build(df, nlist = 4)
    val model = Pq.train(df, m = 4, k = 6, iters = 2)
    val codes = Pq.encode(df, model)
    val indexed = idx.assignments.select(col("id"), col("list_id"))
      .join(codes, Seq("id"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2))
    val full = Pq.adcTopK(queries, codes, model, kTop = 5)
      .collect().map(key).toSet
    val ivfpq = Pq.ivfpqTopK(queries, idx.centroids, indexed, model,
      kTop = 5, nprobe = 4).collect().map(key).toSet
    assert(full == ivfpq)
    assert(full.nonEmpty)
  }

  test("codes are unsigned bytes: k > 128 round-trips through encode + ADC") {
    // handcrafted geometry, k = 200 one-dimensional codewords per
    // subspace (codeword j of subspace s is the scalar s·1000 + j), so
    // the nearest codes of (150.2, 1003.1) are (150, 3). Code 150
    // stores as a NEGATIVE byte — a signed read would reject it (and
    // 255 would alias a -1 sentinel); the & 0xFF read recovers it.
    val k = 200
    val cbs: Seq[Seq[Seq[Double]]] =
      Seq.tabulate(2, k, 1)((s, j, _) => s * 1000.0 + j)
    val codes = Seq((7L, Seq(150.2, 1003.1))).toDF("id", "v")
      .select(col("id"),
        graft.functions.PqEncodeExpr.of(col("v"), cbs).as("codes"))
    assert(codes.head().getSeq[Byte](1) == Seq(150.toByte, 3.toByte))
    // table(s)(c) = c, so the ADC sum recovers the code values: 153
    val tables = Map(1L -> Seq.tabulate(2, k)((_, c) => c.toDouble).map(_.toSeq).toSeq)
    val score = codes.select(
      graft.functions.PqAdcExpr.of(lit(1L), col("codes"), tables)).head()
    assert(!score.isNullAt(0) && score.getDouble(0) == 153.0)
    // and the byte ceiling is enforced where codes are minted
    val e = intercept[IllegalArgumentException] {
      Pq.trainWitness(randomVecs(4, 4, 5L), m = 2, k = 300)
    }
    assert(e.getMessage.contains("outside [2, 256]"))
  }

  test("invalid vector encodes to the empty marker; NULL ADC ranks last, never displaces") {
    implicit val s: SparkSession = spark
    val df = randomVecs(20, 8, 11L).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val model = Pq.train(df, m = 2, k = 4, iters = 2)
    // a length-mismatched vector arrives AFTER training (the unvalidated-
    // corpus path the up-front train guard cannot see)
    val codes = Pq.encode(df.unionByName(
      Seq((999L, Seq(1.0))).toDF("vec_id", "embedding")), model)
    assert(codes.filter(col("id") === 999L).head().getSeq[Byte](1).isEmpty)
    // top-5 of 20 real candidates: the NULL-scored row must not occupy
    // rank 1 (the NULLS FIRST default would put it there)
    val q = df.filter(col("vec_id") === 1L)
    val top5 = Pq.adcTopK(q, codes, model, kTop = 5).collect()
    assert(top5.length == 5)
    assert(!top5.exists(_.getLong(1) == 999L), "NULL score displaced a neighbor")
    assert(top5.forall(!_.isNullAt(2)))
    // with kTop beyond the candidate pool the invalid row IS visible —
    // loud, at the very end, score NULL (the documented semantics)
    val all = Pq.adcTopK(q, codes, model, kTop = 25).collect()
      .sortBy(_.getInt(3))
    assert(all.last.getLong(1) == 999L && all.last.isNullAt(2))
    assert(all.init.forall(!_.isNullAt(2)))
  }

  test("train fails loudly on invalid vectors and bad geometry") {
    implicit val s: SparkSession = spark
    val good = randomVecs(20, 8, 3L).map { case (id, v) => (id, v.toSeq) }
    val e1 = intercept[IllegalArgumentException] {
      Pq.train(good.toDF("vec_id", "embedding"), m = 3, k = 4)
    }
    assert(e1.getMessage.contains("not divisible"))
    val withBad = good.toDF("vec_id", "embedding")
      .unionByName(spark.range(999, 1000).select(col("id").as("vec_id"),
        array(lit(0.5), lit(null).cast("double")).as("embedding")))
    val e2 = intercept[IllegalArgumentException] {
      Pq.train(withBad, m = 2, k = 4)
    }
    assert(e2.getMessage.contains("invalid vector"))
  }

  test("residual ivfpq: score is exactly the per-(query, list) table sum") {
    implicit val s: SparkSession = spark
    import graft.operators.IvfAnn
    val vecs = randomVecs(80, 8, 31L)
    val df = vecs.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val idx = IvfAnn.build(df, nlist = 4)
    val rv = Pq.residuals(idx.assignments, idx.centroids)
    val model = Pq.train(rv, m = 4, k = 6, iters = 2,
      idCol = "id", vecCol = "rv")
    val indexed = idx.assignments.select(col("id"), col("list_id"))
      .join(Pq.encode(rv, model, idCol = "id", vecCol = "rv"), Seq("id"))
    val top = Pq.ivfpqResidualTopK(df.filter(col("vec_id") < 12),
      idx.centroids, indexed, model, kTop = 5, nprobe = 2).collect()
    assert(top.nonEmpty)
    val byId = vecs.toMap
    val cents = idx.centroids.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val listOf = idx.assignments.select(col("id"), col("list_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val codeById = indexed.select(col("id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1).toArray).toMap
    val dsub = model.dim / model.m
    top.foreach { r =>
      val (qid, nid, got) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(qid != nid, "self-match must be excluded")
      // the kernel's exact association: per-sub table entry computed
      // from ((qv − c_list) − cw), the m subtotals summed ascending —
      // c_list is the NEIGHBOR's list centroid (the list the candidate
      // was probed from), the residual-IVFPQ-defining detail
      val qv = byId(qid)
      val c = cents(listOf(nid))
      var acc = 0.0
      for (sub <- 0 until model.m) {
        val cw = model.codebooks(sub)(codeById(nid)(sub) & 0xFF)
        var entry = 0.0
        var i = 0
        while (i < dsub) {
          val d = (qv(sub * dsub + i) - c(sub * dsub + i)) - cw(i)
          entry += d * d; i += 1
        }
        acc += entry
      }
      assert(acc == got, s"residual ADC mismatch for ($qid,$nid): $acc vs $got")
    }
  }

  test("residual ivfpq: nlist == 1 degenerates to plain ADC on the translated corpus") {
    // with a single list every residual is v − c for the SAME c, and
    // the query residual is q − c — squared L2 is translation-
    // invariant, so residual IVF-PQ must equal adcTopK run entirely in
    // residual space (same model, same codes): same dists, same ranks
    implicit val s: SparkSession = spark
    import graft.operators.IvfAnn
    val vecs = randomVecs(60, 8, 41L)
    val df = vecs.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val idx = IvfAnn.build(df, nlist = 1)
    val rv = Pq.residuals(idx.assignments, idx.centroids)
      .persist()
    val model = Pq.train(rv, m = 4, k = 6, iters = 2,
      idCol = "id", vecCol = "rv")
    val codes = Pq.encode(rv, model, idCol = "id", vecCol = "rv")
    val indexed = idx.assignments.select(col("id"), col("list_id"))
      .join(codes, Seq("id"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2))
    val residualSide = Pq.ivfpqResidualTopK(df.filter(col("vec_id") < 12),
      idx.centroids, indexed, model, kTop = 5, nprobe = 1)
      .collect().map(key).toSet
    val translated = Pq.adcTopK(
      rv.filter(col("id") < 12), codes, model, kTop = 5,
      idCol = "id", vecCol = "rv").collect().map(key).toSet
    rv.unpersist()
    assert(residualSide == translated)
    assert(residualSide.nonEmpty)
  }

  test("refineExact: a full-corpus shortlist recovers exact search") {
    // when the shortlist covers every candidate, refinement must equal
    // brute-force exact top-k — the law that makes the rFactor knob a
    // pure recall/cost trade with no correctness cliff
    implicit val s: SparkSession = spark
    val vecs = randomVecs(50, 8, 61L)
    val df = vecs.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 10)
    val model = Pq.train(df, m = 4, k = 4, iters = 2)
    val codes = Pq.encode(df, model)
    val short = Pq.adcTopK(queries, codes, model, kTop = vecs.length)
    val got = Pq.refineExact(short, queries, df, kTop = 5).collect()
      .map(r => (r.getLong(0), r.getInt(4), r.getLong(1), r.getDouble(2)))
      .toSet
    val byId = vecs.toMap
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    val expected = byId.keys.filter(_ < 10).flatMap { qid =>
      vecs.filter(_._1 != qid)
        .map { case (nid, nv) => (nid, sq(byId(qid), nv)) }
        .sortBy { case (nid, d) => (d, nid) }
        .take(5).zipWithIndex
        .map { case ((nid, d), i) => (qid, i + 1, nid, d) }
    }.toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("residual ivfpq rejects list ids outside the composite-key range") {
    implicit val s: SparkSession = spark
    val df = randomVecs(20, 8, 51L).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val model = Pq.train(df, m = 2, k = 4, iters = 1)
    val badCents = Seq((Pq.ListKeyMul.toInt, Seq.fill(8)(0.0)))
      .toDF("list_id", "centroid")
    val indexed = Pq.encode(df, model)
      .withColumn("list_id", lit(Pq.ListKeyMul.toInt))
    val e = intercept[IllegalArgumentException] {
      Pq.ivfpqResidualTopK(df.filter(col("vec_id") < 4), badCents,
        indexed, model, kTop = 3, nprobe = 1)
    }
    assert(e.getMessage.contains("composite table key"))
  }
}
