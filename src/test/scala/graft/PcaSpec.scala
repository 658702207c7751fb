package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pca

/** PCA invariants: the distributed build equals a sequential witness
  * bitwise (possible because every cross-row accumulation is exact
  * integer arithmetic — row order cannot matter), the component
  * recovers a planted dominant direction, and the 2^53 exactness guard
  * fails loudly instead of silently rounding. */
class PcaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("pca-spec", "4").getOrCreate()
  import spark.implicits._

  private def witness(vecs: Seq[Array[Double]], iters: Int = Pca.Iters)
      : (Array[Double], Double) = {
    val dim = vecs.head.length
    val q = vecs.map(_.map(x => math.floor(x * Pca.QuantScale + 0.5).toLong))
    val n = BigInt(q.size)
    val s = Array.tabulate(dim)(i => q.map(v => BigInt(v(i))).sum)
    val m = Array.tabulate(dim, dim) { (i, j) =>
      val sij = q.map(v => BigInt(v(i)) * v(j)).sum
      (n * sij - s(i) * s(j)).toDouble
    }
    def matvec(x: Array[Double]) = Array.tabulate(dim) { i =>
      var acc = 0.0; var j = 0
      while (j < dim) { acc += m(i)(j) * x(j); j += 1 }
      acc
    }
    var x = Array.fill(dim)(1.0)
    for (_ <- 1 to iters) {
      val y = matvec(x)
      val nrm = math.sqrt(y.foldLeft(0.0)((a, v) => a + v * v))
      x = y.map(_ / nrm)
    }
    val y = matvec(x)
    var num = 0.0; var den = 0.0; var i = 0
    while (i < dim) { num += x(i) * y(i); den += x(i) * x(i); i += 1 }
    (x, num / den)
  }

  test("distributed == sequential witness, bitwise, regardless of row order") {
    val rnd = new scala.util.Random(196L)
    val vecs = (0 until 80).map(_ =>
      Array.fill(6)((rnd.nextInt(2000) - 1000) / 997.0))
    val (wx, weig) = witness(vecs)
    // shuffled ingestion order — exact integer sums cannot see it
    val df = rnd.shuffle(vecs.zipWithIndex.toSeq)
      .map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding").repartition(7)
    val got = Pca.topComponent(df).orderBy(col("pos")).collect()
    assert(got.length == 6)
    got.foreach { r =>
      assert(r.getDouble(1) == wx(r.getLong(0).toInt),
        s"pc[${r.getLong(0)}] diverged")
      assert(r.getDouble(2) == weig, "eigval diverged")
    }
  }

  test("recovers a planted dominant direction") {
    val rnd = new scala.util.Random(42L)
    val d = Array(0.6, -0.48, 0.36, -0.24, 0.12, 0.45).map(_ / 1.0)
    val nrm = math.sqrt(d.map(x => x * x).sum)
    val dir = d.map(_ / nrm)
    val vecs = (0 until 200).map { _ =>
      val t = (rnd.nextInt(2000) - 1000) / 500.0
      dir.map(_ * t).zip(Array.fill(6)((rnd.nextInt(100) - 50) / 2000.0))
        .map { case (a, b) => a + b }
    }
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
    val got = Pca.topComponent(df).orderBy(col("pos")).collect()
    val pc = got.map(_.getDouble(1))
    val cos = pc.zip(dir).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.99, s"|cos| = ${math.abs(cos)}")
    assert(got.head.getDouble(2) > 0, "dominant eigenvalue must be positive")
  }

  test("project: distributed == sequential witness (deflation + exact-integer centering)") {
    val rnd = new scala.util.Random(197L)
    val vecs = (0 until 70).map(_ =>
      Array.fill(6)((rnd.nextInt(2000) - 1000) / 997.0))
    // sequential witness with its own deflation + projection
    val dim = 6
    val q = vecs.map(_.map(x => math.floor(x * Pca.QuantScale + 0.5).toLong))
    val n = q.size.toLong
    val s = Array.tabulate(dim)(i => q.map(v => BigInt(v(i))).sum)
    val m = Array.tabulate(dim, dim) { (i, j) =>
      (BigInt(n) * q.map(v => BigInt(v(i)) * v(j)).sum - s(i) * s(j)).toDouble
    }
    def iterate(mm: Array[Array[Double]]): (Array[Double], Double) = {
      def mv(x: Array[Double]) = Array.tabulate(dim) { i =>
        var acc = 0.0; var j = 0
        while (j < dim) { acc += mm(i)(j) * x(j); j += 1 }; acc
      }
      var x = Array.fill(dim)(1.0)
      for (_ <- 1 to Pca.Iters) {
        val y = mv(x)
        val nrm = math.sqrt(y.foldLeft(0.0)((a, v) => a + v * v))
        x = y.map(_ / nrm)
      }
      val y = mv(x)
      var num = 0.0; var den = 0.0; var i = 0
      while (i < dim) { num += x(i) * y(i); den += x(i) * x(i); i += 1 }
      (x, num / den)
    }
    val (x1, e1) = iterate(m)
    val m2 = Array.tabulate(dim, dim)((i, j) => m(i)(j) - e1 * x1(i) * x1(j))
    val (x2, _) = iterate(m2)
    def proj(v: Array[Long], x: Array[Double]): Double = {
      var acc = 0.0; var j = 0
      while (j < dim) {
        acc += (n.toDouble * v(j) - s(j).toDouble) * x(j); j += 1
      }
      acc / n.toDouble
    }
    val expected = q.zipWithIndex
      .map { case (v, i) => i.toLong -> (proj(v, x1), proj(v, x2)) }.toMap
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding").repartition(5)
    val got = Pca.project(df, k = 2).collect()
    assert(got.length == 70)
    got.foreach { r =>
      val (c1, c2) = expected(r.getLong(0))
      assert(r.getDouble(1) == c1 && r.getDouble(2) == c2,
        s"projection diverged at id ${r.getLong(0)}")
    }
    // PC1 captures at least as much spread as PC2 (population variance
    // of the projected coordinates), and the components are near-
    // orthogonal after deflation
    def variance(cs: Seq[Double]): Double = {
      val mu = cs.sum / cs.size
      cs.map(c => (c - mu) * (c - mu)).sum / cs.size
    }
    val v1 = variance(got.map(_.getDouble(1)).toSeq)
    val v2 = variance(got.map(_.getDouble(2)).toSeq)
    assert(v1 >= v2, s"PC1 variance $v1 < PC2 variance $v2")
    val dot = x1.zip(x2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 0.05, s"components not orthogonal: $dot")
  }

  test("streaming moment maintenance: serve == monolith, replay idempotent, as-of exact, compaction invisible") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val rnd = new scala.util.Random(198L)
    def mkBatch(n: Int, off: Int) = (0 until n).map(i =>
      ((off + i).toLong, Seq.fill(6)((rnd.nextInt(2000) - 1000) / 997.0)))
    val batches = Seq(mkBatch(30, 0), mkBatch(25, 100), mkBatch(20, 200))
    val dir = java.nio.file.Files
      .createTempDirectory("pca-ingest").toString
    val stream = MemoryStream[(Long, Seq[Double])]
    val q = stream.toDS().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch(graft.streaming.PcaIngest.momentSink(dir))
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()
    def pcOf(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("pos")).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    val all = batches.flatten.toDF("vec_id", "embedding")
    val monolith = pcOf(graft.operators.Pca.topComponent(all))
    val served = pcOf(graft.streaming.PcaIngest.serveTopComponent(spark, dir))
    assert(served == monolith,
      "served component must be BIT-equal to the monolithic build")
    // replayed batch overwrites its own delta — serve unchanged
    graft.streaming.PcaIngest.ingest(
      batches(1).toDF("vec_id", "embedding"), dir, "b000000001")
    assert(pcOf(graft.streaming.PcaIngest.serveTopComponent(spark, dir))
      == monolith, "replay must be invisible")
    // as-of the second batch == monolith over the first two batches
    val firstTwo = pcOf(graft.operators.Pca.topComponent(
      (batches(0) ++ batches(1)).toDF("vec_id", "embedding")))
    assert(pcOf(graft.streaming.PcaIngest.serveTopComponentAsOf(
      spark, dir, "b000000001")) == firstTwo, "as-of snapshot diverged")
    // compaction folds history without changing the served result
    assert(graft.sources.MomentStore.compact(spark, dir) >= 1)
    assert(pcOf(graft.streaming.PcaIngest.serveTopComponent(spark, dir))
      == monolith, "compaction must be invisible")
  }

  test("rounded serve == exact serve wherever the exact guard passes (two scale factors)") {
    // the law that keeps the oracle discipline while lifting the
    // ceiling: below n²·qmax² < 2^53 the rounded path must be the
    // IDENTITY — round-to-nearest of an exactly-representable integer
    // is itself, so any divergence means the rounded path stopped
    // being the same algebra
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val cells = Pca.momentCells(spark.read
        .parquet(s"/root/testdata/$sf/embeddings.parquet"))
      val exact = Pca.topComponentFromCells(cells, rounded = false)
        .orderBy(col("pos")).collect().map(r =>
          (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
      val rounded = Pca.topComponentFromCells(cells, rounded = true)
        .orderBy(col("pos")).collect().map(r =>
          (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
      assert(rounded == exact, s"$sf: rounded serve diverged in the exact regime")
    }
  }

  test("projectFromCells == project, bitwise, at two scale factors (exact and rounded flags)") {
    // the projection-serving law: components + centering state derived
    // from the moment store must reproduce the batch build exactly —
    // and below the ceiling the rounded flag is the identity, so all
    // three paths coincide
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val corpus = spark.read
        .parquet(s"/root/testdata/$sf/embeddings.parquet")
      val batch = Pca.project(corpus, k = 2)
        .orderBy(col("id")).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
      val cells = Pca.momentCells(corpus)
      for (rounded <- Seq(false, true)) {
        val served = Pca.projectFromCells(cells, corpus, k = 2,
          rounded = rounded)
          .orderBy(col("id")).collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
        assert(served == batch, s"$sf rounded=$rounded: serve diverged")
      }
    }
  }

  test("rounded serve past the 2^53 ceiling: exact refuses, rounded matches the witness") {
    // large-n soak: 200k vectors at qmax ≈ 1027 puts n²·qmax² ≈ 4.2e16
    // past the 2^53 ≈ 9.0e15 exactness ceiling, with the DIAGONAL
    // scatter cells themselves (≈ n²·var_q ≈ 1.4e16) needing more than
    // 53 bits — the regime the streaming moment store is FOR (its
    // cells stay exact; only the serve-time int→double conversion
    // rounds)
    val n = 200000
    val dim = 4
    val df = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        ((col("id") * 7 + j * 13) % 1999 - 999).cast("double") / 997.0)
        .as("embedding"))
    val cells = Pca.momentCells(df)
    val e = intercept[IllegalArgumentException] {
      Pca.topComponentFromCells(cells, rounded = false)
    }
    assert(e.getMessage.contains("2^53") && e.getMessage.contains("rounded"))
    val got = Pca.topComponentFromCells(cells, rounded = true)
      .orderBy(col("pos")).collect()
    // sequential witness: same exact BigInt moments, same signif53
    // truncate-then-convert, same ten iterations
    val q = (0 until n).map(id => Array.tabulate(dim)(j =>
      math.floor((((id.toLong * 7 + j * 13) % 1999 - 999) / 997.0) *
        Pca.QuantScale + 0.5).toLong))
    val bigN = BigInt(n)
    val s = Array.tabulate(dim)(i => q.foldLeft(BigInt(0))((a, v) => a + v(i)))
    val m = Array.tabulate(dim, dim) { (i, j) =>
      val sij = q.foldLeft(BigInt(0))((a, v) => a + BigInt(v(i)) * v(j))
      Pca.signif53(bigN * sij - s(i) * s(j)) // truncates: past the ceiling
    }
    // the soak must actually exercise rounding, not sit inside 2^53
    assert(m.flatten.exists(v => math.abs(v) > 9.1e15),
      "fixture too small — scatter never left the exact regime")
    def mv(x: Array[Double]) = Array.tabulate(dim) { i =>
      var acc = 0.0; var j = 0
      while (j < dim) { acc += m(i)(j) * x(j); j += 1 }; acc
    }
    var x = Array.fill(dim)(1.0)
    for (_ <- 1 to Pca.Iters) {
      val y = mv(x)
      val nrm = math.sqrt(y.foldLeft(0.0)((a, v) => a + v * v))
      x = y.map(_ / nrm)
    }
    val y = mv(x)
    var num = 0.0; var den = 0.0; var i = 0
    while (i < dim) { num += x(i) * y(i); den += x(i) * x(i); i += 1 }
    val eig = num / den
    assert(got.length == dim)
    got.foreach { r =>
      assert(r.getDouble(1) == x(r.getLong(0).toInt),
        s"rounded pc[${r.getLong(0)}] diverged from the witness")
      assert(r.getDouble(2) == eig, "rounded eigval diverged")
    }
    // projection serving in the same regime: a slice of the corpus
    // projected under the all-history rounded components must match
    // the sequential fold (exact only refuses here too)
    intercept[IllegalArgumentException] {
      Pca.projectFromCells(cells, df.filter(col("vec_id") < 100), k = 1)
    }
    val proj = Pca.projectFromCells(cells, df.filter(col("vec_id") < 100),
      k = 1, rounded = true).orderBy(col("id")).collect()
    assert(proj.length == 100)
    proj.foreach { r =>
      val v = q(r.getLong(0).toInt)
      var acc = 0.0; var j = 0
      while (j < dim) {
        acc += (n.toDouble * v(j) - s(j).toDouble) * x(j); j += 1
      }
      assert(r.getDouble(1) == acc / n.toDouble,
        s"rounded projection diverged at id ${r.getLong(0)}")
    }
  }

  test("empty micro-batch: ingest is a no-op, momentCells names the refusal") {
    val empty = spark.range(0).select(col("id").as("vec_id"),
      array(lit(1.0)).as("embedding"))
    val dir = java.nio.file.Files
      .createTempDirectory("pca-ingest-empty").toString
    graft.streaming.PcaIngest.ingest(empty, dir, "b000000000")
    val e = intercept[IllegalArgumentException] {
      Pca.momentCells(empty)
    }
    assert(e.getMessage.contains("batch is empty"))
    // the no-op left no delta behind: serving still reports empty store
    val e2 = intercept[IllegalArgumentException] {
      graft.streaming.PcaIngest.serveTopComponent(spark, dir)
    }
    assert(e2.getMessage.contains("empty"))
  }

  test("exactness guard and invalid vectors fail loudly") {
    val big = (0 until 10).map(i => (i.toLong, Seq.fill(4)(1.0e7)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      Pca.topComponent(big)
    }
    assert(e1.getMessage.contains("2^53"))
    val bad = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(1.0, Double.NaN)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding",
        when(col("vec_id") === 2, array(lit(1.0), lit(null).cast("double")))
          .otherwise(col("embedding")))
    val e2 = intercept[IllegalArgumentException] {
      Pca.topComponent(bad)
    }
    assert(e2.getMessage.contains("invalid vector"))
  }
}
