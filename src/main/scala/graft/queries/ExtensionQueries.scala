package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.operators.{AsofJoin, RangeJoin, Sessionize}

/** Oracle-verified extension operators Spark lacks natively: rolling-hash
  * document fingerprints (DuckDB re-derives every window hash with a
  * list_reduce polynomial fold — BIGINT-exact, base 257 mod 1e9+7) and
  * the as-of join (DuckDB has native ASOF JOIN as the oracle).
  */
object ExtensionQueries {

  /** DuckDB dot product matching Similarity.dot's sequential double fold
    * (same helper as PipelineQueries'). */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"

  private def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  /** DuckDB squared L2 distance matching VectorExpressions.sqDist. */
  private def sqDistSql(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b),
       |  x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
       |       * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))""".stripMargin

  /** q213 oracle: all k Gonzalez rounds as a chained CTE — every stage
    * MATERIALIZED because each d_t is read twice (the argmax and the
    * next fold); inlining would re-evaluate the quantization 2^k
    * times. Selection semantics mirror Coreset.kCenter exactly:
    * smallest-id seed, argmax over UNSELECTED points, ties (mind desc,
    * id asc), distances on the floor(x·1024 + 0.5) integer grid. */
  private def kCenterSql(k: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH qz AS MATERIALIZED (SELECT vec_id AS id,
      |  list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 1024 + 0.5) AS BIGINT)) AS qv
      |  FROM embeddings),
      |c1 AS MATERIALIZED (SELECT id, qv FROM qz ORDER BY id ASC LIMIT 1),
      |d1 AS MATERIALIZED (SELECT q.id, q.qv,
      |  ${sqDistSql("q.qv", "c1.qv")} AS mind FROM qz q, c1)""".stripMargin
    for (t <- 2 to k) {
      val notIn = (1 until t).map(i => s"SELECT id FROM c$i")
        .mkString(" UNION ALL ")
      sb ++= s""",
      |c$t AS MATERIALIZED (SELECT id, qv, mind FROM d${t - 1}
      |  WHERE id NOT IN ($notIn) ORDER BY mind DESC, id ASC LIMIT 1),
      |d$t AS MATERIALIZED (SELECT d.id, d.qv,
      |  least(d.mind, ${sqDistSql("d.qv", s"c$t.qv")}) AS mind
      |  FROM d${t - 1} d, c$t)""".stripMargin
    }
    val sels = (Seq("SELECT 1 AS r, id AS vec_id, CAST(0 AS BIGINT) AS sel_dist FROM c1") ++
      (2 to k).map(t => s"SELECT $t, id, CAST(mind AS BIGINT) FROM c$t"))
      .mkString(" UNION ALL ")
    sb ++= s""",
      |rad AS (SELECT CAST(max(mind) AS BIGINT) AS radius FROM d$k),
      |sel AS ($sels)
      |SELECT CAST(sel.r AS BIGINT) AS sel_rank,
      |  CAST(sel.vec_id AS BIGINT) AS vec_id, sel.sel_dist, rad.radius
      |FROM sel, rad ORDER BY sel_rank""".stripMargin
    sb.toString
  }

  /** Placeholder the q102/q124 oracle SQL embeds for the IVF fixture
    * root. The real location is a per-(applicationId, sf-dir) temp
    * directory — a fixed world-shared `/tmp` path would let concurrent
    * runs clobber each other, and a second scale factor in the same
    * session would overwrite the first sf's index so a later probe at
    * the first sf reads the wrong data. Verify substitutes the resolved
    * path when dumping oracle_sql.json (queries run before the dump, so
    * the index the oracle reads is the one built from the SAME sf). */
  val IvfFixtureToken = "__GRAFT_IVF_FIXTURE__"

  /** Driver-memory bound on the KMeans-witness fixture: the sequential
    * witness (q139/q140's oracle derivation) collects its input corpus
    * to the driver, which is corpus-shaped — unbounded in sf. The cap is
    * a deterministic id-prefix (`vec_id < cap`) applied IDENTICALLY to
    * the engine build and the witness, so the fixture chain stays
    * self-consistent at any sf. 262,144 vectors × dim 64 doubles ≈
    * 134 MB on the driver — far above every sf ever run (sf10 scaledata
    * is ~200k embeddings), so the cap is a no-op at test scale and a
    * hard OOM guard beyond it. */
  val IvfFixtureCap = 262144L

  /** The fixture-chain corpus: the capped id-prefix of `embeddings`
    * shared by the engine build, the sequential witness, and q139/q140's
    * retrain — all four MUST train on the same rows. */
  private def fixtureCorpus(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables(s, dir).embeddings.filter(col("vec_id") < IvfFixtureCap)

  private val ivfFixtureDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The run-scoped fixture root for (this session, this sf dir) —
    * created on first use, same value for every later caller. */
  def ivfFixturePath(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    ivfFixtureDirs.computeIfAbsent(
      s.sparkContext.applicationId + ":" + dir,
      _ => java.nio.file.Files.createTempDirectory("graft-ivf").toString)

  /** Build-once-per-(session, sf) guard for the IVF fixture: q102 and
    * q124 both consume it, and either may run first (or alone). The
    * KMeans build is fully deterministic, so whichever caller builds
    * writes the same bytes. Returns the fixture root. */
  private val ivfFixtureBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
  private def ensureIvfFixture(s: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val key = s.sparkContext.applicationId + ":" + dir
    val path = ivfFixturePath(s, dir)
    ivfFixtureBuilt.computeIfAbsent(key, _ => {
      implicit val sess: org.apache.spark.sql.SparkSession = s
      graft.operators.IvfAnn.write(
        graft.operators.IvfAnn.build(fixtureCorpus(s, dir), nlist = 8),
        path)
      // q139/q140's KMEANS WITNESS: the same (nlist, iters) build
      // recomputed by IvfAnn.buildWitness — sequential arrays-and-loops
      // Lloyd sharing the contract (mean-nearest seed + derandomized k-means++ init,
      // id-ordered mean fold) but no mechanism with the distributed
      // trainer. Centroids exploded to (list_id, pos, c) scalar rows so
      // the hash compare is per-value.
      import s.implicits._
      val vecs = fixtureCorpus(s, dir) // capped: witness input is a driver collect
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
      val (wCents, wAssign) = graft.operators.IvfAnn.buildWitness(vecs, nlist = 8)
      wCents.zipWithIndex.flatMap { case (c, li) =>
        c.zipWithIndex.map { case (x, pos) => (li, pos.toLong, x) }
      }.toSeq.toDF("list_id", "pos", "c")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$path/kmeans_witness/centroids")
      wAssign.toDF("id", "list_id")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$path/kmeans_witness/assignments")
      true
    })
    path
  }

  /** PQ geometry for the q149–q151 fixture chain: dim 64 → m=8
    * subspaces of 8 dims, k=16 codewords each — 8 bytes per vector,
    * a 64× cut vs the raw doubles (vs int8's 4×). k is 16 rather than
    * the production 256 because the capped test corpora are small;
    * the job shape is k-independent by design. */
  private val PqM = 8
  private val PqK = 16

  /** Engine-trained PQ model memoized per (session, sf) — the serving
    * convention (round 19): the PROBE queries (q151/q152/q192/q193)
    * rank against an index whose model is trained ONCE at build time,
    * exactly like the persisted IVF centroids they already read; only
    * q149/q150 (whose declared results ARE the train/encode stages)
    * keep retraining per run. Deterministic train ⇒ identical model ⇒
    * identical rankings; the oracle still re-derives everything from
    * the INDEPENDENT sequential witness fixtures. */
  private val pqModelCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, graft.operators.Pq.PqModel]()
  private def pqEngineModel(s: org.apache.spark.sql.SparkSession,
      dir: String): graft.operators.Pq.PqModel =
    pqModelCache.computeIfAbsent(
      s.sparkContext.applicationId + ":" + dir,
      _ => {
        implicit val sess: org.apache.spark.sql.SparkSession = s
        graft.operators.Pq.train(fixtureCorpus(s, dir), PqM, PqK)
      })

  /** Engine-trained RESIDUAL PQ model memoized per (session, sf) —
    * the same serving convention for the IVFADC family (q192/q193). */
  private val resPqModelCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, graft.operators.Pq.PqModel]()
  private def residualEngineModel(s: org.apache.spark.sql.SparkSession,
      dir: String): graft.operators.Pq.PqModel =
    resPqModelCache.computeIfAbsent(
      s.sparkContext.applicationId + ":" + dir,
      _ => {
        implicit val sess: org.apache.spark.sql.SparkSession = s
        val persisted = graft.operators.IvfAnn.read(
          s, ensureIvfFixture(s, dir))
        graft.operators.Pq.train(
          graft.operators.Pq.residuals(
            persisted.assignments, persisted.centroids),
          PqM, PqK, idCol = "id", vecCol = "rv")
      })

  /** Build-once-per-(session, sf) PQ WITNESS fixture: the sequential
    * [[graft.operators.Pq.trainWitness]] codebooks as (sub, code, pos,
    * c) scalar rows — q149's oracle reads them verbatim; q150/q151
    * re-derive encodes and ADC rankings from them in DuckDB, so the
    * engine's train/encode/probe kernels are all independently
    * checked. Shares [[fixtureCorpus]]'s capped id-prefix with the
    * engine side. */
  private val pqFixtureBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
  private def ensurePqFixture(s: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val key = s.sparkContext.applicationId + ":" + dir
    val path = ivfFixturePath(s, dir)
    pqFixtureBuilt.computeIfAbsent(key, _ => {
      import s.implicits._
      val vecs = fixtureCorpus(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
      val (cbs, _) = graft.operators.Pq.trainWitness(vecs, PqM, PqK)
      cbs.zipWithIndex.flatMap { case (cb, sub) =>
        cb.zipWithIndex.flatMap { case (cw, code) =>
          cw.zipWithIndex.map { case (x, pos) =>
            (sub, code, pos.toLong, x) }
        }
      }.toSeq.toDF("sub", "code", "pos", "c")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$path/pq_witness/codebooks")
      true
    })
    path
  }

  /** Build-once-per-(session, sf) RESIDUAL PQ witness fixture for
    * q192: sequential residuals r = v − c(assigned list) computed from
    * the PERSISTED engine index parquet (assignments carry v, so the
    * witness subtracts exactly the doubles the engine's
    * [[graft.operators.Pq.residuals]] zip_with sees — the q152
    * precedent of both sides reading the same persisted fixture), then
    * [[graft.operators.Pq.trainWitness]] over those residuals. Written
    * as (sub, code, pos, c) scalar rows to
    * `pq_witness/residual_codebooks`. */
  private val resPqFixtureBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
  private def ensureResidualPqFixture(s: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val key = s.sparkContext.applicationId + ":" + dir
    val path = ensureIvfFixture(s, dir)
    resPqFixtureBuilt.computeIfAbsent(key, _ => {
      import s.implicits._
      val cents: Map[Int, Array[Double]] = s.read
        .parquet(s"$path/centroids")
        .select(col("list_id").cast("int"),
          col("centroid").cast("array<double>"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      val rvs = s.read.parquet(s"$path/assignments")
        .select(col("id"), col("v").cast("array<double>"),
          col("list_id").cast("int"))
        .collect()
        .map { r =>
          val v = r.getSeq[Double](1).toArray
          val c = cents(r.getInt(2))
          val rv = new Array[Double](v.length)
          var i = 0
          while (i < v.length) { rv(i) = v(i) - c(i); i += 1 }
          (r.getLong(0), rv)
        }.toSeq
      val (cbs, _) = graft.operators.Pq.trainWitness(rvs, PqM, PqK)
      cbs.zipWithIndex.flatMap { case (cb, sub) =>
        cb.zipWithIndex.flatMap { case (cw, code) =>
          cw.zipWithIndex.map { case (x, pos) =>
            (sub, code, pos.toLong, x) }
        }
      }.toSeq.toDF("sub", "code", "pos", "c")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$path/pq_witness/residual_codebooks")
      true
    })
    path
  }

  /** Build-once-per-(session, sf) JL sign-matrix fixture: the ±1
    * matrix is a pure function of (t, j) through the splitmix64
    * contract ([[graft.operators.Jl.sign]]), written as (t, j, s)
    * scalar rows so the DuckDB oracle can join it — the q149 witness
    * discipline (the hash itself is not expressible in SQL without
    * wrapping 64-bit multiplies, which DuckDB refuses). */
  private val jlFixtureBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
  private val JlTargetDim = 16
  private val JlDim = 64
  private def ensureJlFixture(s: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val key = s.sparkContext.applicationId + ":" + dir
    val path = ivfFixturePath(s, dir)
    jlFixtureBuilt.computeIfAbsent(key, _ => {
      import s.implicits._
      val m = graft.operators.Jl.signMatrix(JlTargetDim, JlDim)
      m.zipWithIndex.flatMap { case (row, t) =>
        row.zipWithIndex.map { case (sv, j) => (t, j, sv) }
      }.toSeq.toDF("t", "j", "s")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$path/jl_signs")
      true
    })
    path
  }

  val entries: Map[String, QueryDef] = Map(

    // Rolling Rabin-Karp window fingerprints with mod-sampling: the
    // kernel's O(len) rolling recurrence must equal the direct per-window
    // polynomial hash (the oracle computes each window from scratch).
    "q54_rolling_fingerprints" -> QueryDef(
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |cp AS (SELECT doc_id,
        |         list_transform(range(length(text)),
        |           i -> unicode(substr(text, CAST(i+1 AS INT), 1))) AS cps
        |       FROM d),
        |wins AS (
        |  SELECT doc_id, list_distinct(list_filter(
        |    list_transform(range(greatest(len(cps) - 7, 0)), s ->
        |      list_reduce(cps[CAST(s+1 AS INT):CAST(s+8 AS INT)],
        |        (h, c) -> (CAST(h AS BIGINT) * 257 + c) % 1000000007)),
        |    h -> h % 4 = 0)) AS fps
        |  FROM cp)
        |SELECT doc_id,
        |       len(fps) AS n_fps,
        |       CAST(coalesce(list_min(fps), -1) AS BIGINT) AS min_fp,
        |       CAST(coalesce(list_max(fps), -1) AS BIGINT) AS max_fp,
        |       CAST(coalesce(list_sum(fps), 0) AS BIGINT) AS sum_fp
        |FROM wins ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val fps = graft.functions.RollingHashExpr.of(col("text"), 8, 4)
      Tables(s, dir).documents
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), fps.as("fps"))
        .select(col("doc_id"),
          size(col("fps")).cast("long").as("n_fps"),
          coalesce(array_min(col("fps")), lit(-1L)).as("min_fp"),
          coalesce(array_max(col("fps")), lit(-1L)).as("max_fp"),
          aggregate(col("fps"), lit(0L), (a, x) => a + x).as("sum_fp"))
        .orderBy(col("doc_id"))
    },

    // Winnowing selection over the same rolling window hashes: distinct
    // minimums of every 4 consecutive window hashes — guarantees a
    // fingerprint in every 4-window stretch (mod-sampling can gap).
    "q62_winnowed_fingerprints" -> QueryDef(
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 5),
        |cp AS (SELECT doc_id,
        |         list_transform(range(length(text)),
        |           i -> unicode(substr(text, CAST(i+1 AS INT), 1))) AS cps
        |       FROM d),
        |hs AS (
        |  SELECT doc_id,
        |    list_transform(range(greatest(len(cps) - 7, 0)), s ->
        |      list_reduce(cps[CAST(s+1 AS INT):CAST(s+8 AS INT)],
        |        (h, c) -> (CAST(h AS BIGINT) * 257 + c) % 1000000007)) AS hashes
        |  FROM cp),
        |win AS (
        |  SELECT doc_id, CASE WHEN len(hashes) = 0 THEN CAST([] AS BIGINT[])
        |    ELSE list_distinct(list_transform(
        |      range(len(hashes) - least(4, len(hashes)) + 1), s ->
        |        list_min(hashes[CAST(s+1 AS INT):CAST(s + least(4, len(hashes)) AS INT)])))
        |    END AS fps
        |  FROM hs)
        |SELECT doc_id,
        |       len(fps) AS n_fps,
        |       CAST(coalesce(list_min(fps), -1) AS BIGINT) AS min_fp,
        |       CAST(coalesce(list_max(fps), -1) AS BIGINT) AS max_fp,
        |       CAST(coalesce(list_sum(fps), 0) AS BIGINT) AS sum_fp
        |FROM win ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val fps = graft.functions.RollingHashExpr.winnowed(col("text"), 8, 4)
      Tables(s, dir).documents
        .filter(col("doc_id") % 10 === 5)
        .select(col("doc_id"), fps.as("fps"))
        .select(col("doc_id"),
          size(col("fps")).cast("long").as("n_fps"),
          coalesce(array_min(col("fps")), lit(-1L)).as("min_fp"),
          coalesce(array_max(col("fps")), lit(-1L)).as("max_fp"),
          aggregate(col("fps"), lit(0L), (a, x) => a + x).as("sum_fp"))
        .orderBy(col("doc_id"))
    },

    // As-of join: every "trade" (click event) matched to the most recent
    // "quote" (view event) for the same user at or before its timestamp.
    // DuckDB's native ASOF JOIN is the oracle; quotes are pre-aggregated
    // to unique (key, ts) so the match is well-defined in both engines.
    "q55_asof_join" -> QueryDef(
      """WITH trades AS (
        |  SELECT event_id, user_id % 25 AS k, ts
        |  FROM events WHERE event_type = 'click'),
        |quotes AS (
        |  SELECT user_id % 25 AS k, ts, max(value) AS quote
        |  FROM events WHERE event_type = 'view'
        |  GROUP BY 1, 2)
        |SELECT t.event_id, t.k,
        |       strftime(t.ts, '%Y-%m-%d %H:%M:%S') AS trade_ts,
        |       q.quote
        |FROM trades t ASOF LEFT JOIN quotes q
        |  ON t.k = q.k AND t.ts >= q.ts
        |ORDER BY t.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir).events
      val trades = ev.filter(col("event_type") === "click")
        .select(col("event_id"), (col("user_id") % 25).as("k"), col("ts"))
      val quotes = ev.filter(col("event_type") === "view")
        .groupBy((col("user_id") % 25).as("k"), col("ts"))
        .agg(max(col("value")).as("quote"))
        .withColumn("qid", monotonically_increasing_id())
      AsofJoin.asof(trades, quotes, keyCol = "k", tsCol = "ts",
        payload = Seq("quote"), rightSeqCol = "qid")
        .select(col("event_id"), col("k"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("trade_ts"),
          col("quote"))
        .orderBy(col("event_id"))
    },

    // L2 normalization: unit vectors emitted per (vec_id, pos) — the
    // norm and the division are sequential-fold double math, exactly
    // reproducible in DuckDB.
    "q60_embedding_normalize" -> QueryDef(
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_sum(list_transform(embedding,
        |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings WHERE vec_id < 300),
        |n AS (
        |  SELECT vec_id,
        |         CASE WHEN nrm > 0
        |              THEN list_transform(embedding, x -> CAST(x AS DOUBLE) / nrm)
        |              ELSE list_transform(embedding, x -> 0.0) END AS nv
        |  FROM e)
        |SELECT vec_id, i AS pos, nv[CAST(i+1 AS INT)] AS nval
        |FROM n, unnest(range(len(nv))) AS u(i)
        |ORDER BY vec_id, pos""".stripMargin) { (s, dir) =>
      import graft.operators.Embeddings
      Tables(s, dir).embeddings.filter(col("vec_id") < 300)
        .select(col("vec_id"), Embeddings.normalize(col("embedding")).as("nv"))
        .select(col("vec_id"), posexplode(col("nv")).as(Seq("pos", "nval")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"), col("nval"))
        .orderBy(col("vec_id"), col("pos"))
    },

    // Mean pooling: one mean vector per group of embeddings, as
    // (group, pos, mean, n) rows. Both engines fold member values in
    // vec_id order, so the double sums are bit-identical.
    "q61_mean_pool" -> QueryDef(
      """WITH x AS (
        |  SELECT vec_id % 50 AS g, vec_id,
        |         i AS pos, embedding[CAST(i+1 AS INT)] AS v
        |  FROM embeddings, unnest(range(len(embedding))) AS u(i))
        |SELECT g, pos,
        |       list_sum(list(CAST(v AS DOUBLE) ORDER BY vec_id)) / count(*) AS mean,
        |       count(*) AS n
        |FROM x GROUP BY g, pos ORDER BY g, pos""".stripMargin) { (s, dir) =>
      import graft.operators.Embeddings
      Embeddings.meanPool(Tables(s, dir).embeddings, col("vec_id") % 50)
        .select(col("g"), col("pos").cast("long").as("pos"),
          col("mean"), col("n"))
        .orderBy(col("g"), col("pos"))
    },

    // IVF recall-vs-nprobe curve as a registered query row: the
    // measurement that prices the accuracy/cost dial (each +1 nprobe
    // reads one more list partition per query) before committing an ANN
    // configuration to a 100 TB corpus. The Spark side builds the index
    // (seed-fixed KMeans), PERSISTS it to the fixture path, and probes
    // the persisted copy; the oracle re-derives the entire recall
    // arithmetic — probe-list ranking by squared L2 to the centroids,
    // cosine scoring over probed lists, top-k, hit join vs brute-force
    // truth, integer permille — from the same fixture parquet. Only
    // KMeans training itself stays spec-land (IvfSpec pins the curve's
    // shape invariants: monotone, 1000 at full probe).
    "q102_ivf_recall" -> QueryDef(
      s"""WITH a AS (SELECT id, v, CAST(list_id AS INT) AS list_id
         |  FROM read_parquet('$IvfFixtureToken/assignments/*/*.parquet',
         |                    hive_partitioning = true)),
         |c AS (SELECT CAST(list_id AS INT) AS list_id, centroid
         |      FROM read_parquet('$IvfFixtureToken/centroids/*.parquet')),
         |q AS (SELECT vec_id AS query_id, embedding AS qv
         |      FROM embeddings WHERE vec_id < 10),
         |bs AS (SELECT query_id, vec_id AS neighbor_id,
         |         ${cosineSql("qv", "embedding")} AS cosine
         |       FROM embeddings e JOIN q ON q.query_id <> e.vec_id),
         |truth AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY cosine DESC, neighbor_id ASC) AS rnk FROM bs)
         |  WHERE rnk <= 10),
         |tt AS (SELECT count(*) AS n_true FROM truth),
         |cd AS (SELECT query_id, qv, list_id,
         |         ${sqDistSql("qv", "centroid")} AS cdist
         |       FROM q CROSS JOIN c),
         |cr AS (SELECT query_id, qv, list_id,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY cdist ASC, list_id ASC) AS crank FROM cd),
         |np AS (SELECT unnest([1, 2, 4, 8]) AS nprobe),
         |probes AS (SELECT np.nprobe, cr.query_id, cr.qv, cr.list_id
         |           FROM np JOIN cr ON cr.crank <= np.nprobe),
         |scored AS (SELECT nprobe, query_id, a.id AS neighbor_id,
         |             ${cosineSql("qv", "a.v")} AS cosine
         |           FROM probes JOIN a USING (list_id)
         |           WHERE query_id <> a.id),
         |ann AS (SELECT nprobe, query_id, neighbor_id FROM (
         |  SELECT nprobe, query_id, neighbor_id,
         |         ROW_NUMBER() OVER (PARTITION BY nprobe, query_id
         |           ORDER BY cosine DESC, neighbor_id ASC) AS rnk FROM scored)
         |  WHERE rnk <= 10),
         |hits AS (SELECT nprobe, count(*) AS n_hits
         |         FROM ann JOIN truth USING (query_id, neighbor_id)
         |         GROUP BY nprobe)
         |SELECT CAST(np.nprobe AS INT) AS nprobe,
         |       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
         |       CAST(tt.n_true AS BIGINT) AS n_true,
         |       CAST(CASE WHEN tt.n_true > 0
         |            THEN coalesce(h.n_hits, 0) * 1000 // tt.n_true
         |            ELSE 1000 END AS BIGINT) AS recall_permille
         |FROM np LEFT JOIN hits h USING (nprobe), tt
         |ORDER BY nprobe""".stripMargin) { (s, dir) =>
      import graft.operators.IvfAnn
      val e = Tables(s, dir).embeddings
      val fixture = ensureIvfFixture(s, dir) // seed-fixed, once per sf
      // probe the PERSISTED copy: the exact bytes the oracle reads drive
      // the Spark side too (and the probe join runs partition-pruned)
      val persisted = IvfAnn.read(s, fixture)
      IvfAnn.recallCurve(e.filter(col("vec_id") < 10), persisted, k = 10,
        nprobes = Seq(1, 2, 4, 8)).orderBy(col("nprobe"))
    },

    // The KMeans BUILD itself, oracled (closing the one spec-land stage
    // of the q102 fixture chain): the engine retrains the deterministic
    // Lloyd build (mean-nearest seed + derandomized k-means++ init, strict-less
    // id-ordered mean folds) and emits the final centroids as
    // (list_id, pos, c) scalar rows; the oracle reads the SEQUENTIAL
    // witness's centroids from the fixture. Bitwise double equality is
    // the claim — the id-ordered fold makes distributed summation order
    // deterministic, so the hash compare is exact, not approximate.
    "q139_kmeans_centroids" -> QueryDef(
      s"""SELECT CAST(list_id AS INT) AS list_id, CAST(pos AS BIGINT) AS pos, c
         |FROM read_parquet('$IvfFixtureToken/kmeans_witness/centroids/*.parquet')
         |ORDER BY list_id, pos""".stripMargin) { (s, dir) =>
      implicit val sess: org.apache.spark.sql.SparkSession = s
      ensureIvfFixture(s, dir)
      val idx = graft.operators.IvfAnn.build(fixtureCorpus(s, dir), nlist = 8)
      idx.centroids
        .select(col("list_id").cast("int").as("list_id"),
          posexplode(col("centroid")).as(Seq("pos", "c")))
        .select(col("list_id"), col("pos").cast("long").as("pos"), col("c"))
        .orderBy(col("list_id"), col("pos"))
    },

    // The build's ASSIGNMENTS against the witness: every corpus vector's
    // final list under the engine's distributed train must equal the
    // sequential witness's — together with q139 this pins the whole
    // clustering, so q102/q124's fixture chain is independently derived
    // end to end (build by two mechanisms here, probe/assign arithmetic
    // re-derived by DuckDB there).
    "q140_kmeans_assign" -> QueryDef(
      s"""SELECT id, CAST(list_id AS INT) AS list_id
         |FROM read_parquet('$IvfFixtureToken/kmeans_witness/assignments/*.parquet')
         |ORDER BY id""".stripMargin) { (s, dir) =>
      implicit val sess: org.apache.spark.sql.SparkSession = s
      ensureIvfFixture(s, dir)
      val idx = graft.operators.IvfAnn.build(fixtureCorpus(s, dir), nlist = 8)
      idx.assignments
        .select(col("id"), col("list_id").cast("int").as("list_id"))
        .orderBy(col("id"))
    },

    // Incremental index maintenance, the ingestion half: a new vector
    // batch assigned to its nearest persisted centroid (squared-L2,
    // ties to the lower list id) WITHOUT retraining — what keeps an IVF
    // index current as the corpus grows; q102 prices the probe side,
    // this prices admission. The oracle re-derives every assignment
    // from the fixture's centroids parquet.
    "q124_ivf_assign" -> QueryDef(
      s"""WITH c AS (SELECT CAST(list_id AS INT) AS list_id, centroid
         |      FROM read_parquet('$IvfFixtureToken/centroids/*.parquet')),
         |v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 7),
         |d AS (SELECT vec_id, list_id,
         |        ${sqDistSql("embedding", "centroid")} AS cdist
         |      FROM v CROSS JOIN c),
         |r AS (SELECT vec_id, list_id,
         |        ROW_NUMBER() OVER (PARTITION BY vec_id
         |          ORDER BY cdist ASC, list_id ASC) AS rk FROM d)
         |SELECT vec_id AS id, list_id FROM r WHERE rk = 1
         |ORDER BY id""".stripMargin) { (s, dir) =>
      import graft.operators.IvfAnn
      val fixture = ensureIvfFixture(s, dir)
      val centroids = IvfAnn.read(s, fixture).centroids
      IvfAnn.assign(
        Tables(s, dir).embeddings.filter(col("vec_id") % 10 === 7), centroids)
        .select(col("id"), col("list_id"))
        .orderBy(col("id"))
    },

    // The PQ codebook TRAINING, oracled (the q139 pattern for product
    // quantization): the engine retrains the deterministic joint build
    // (hash-sample init, strict-less per-subspace assignment,
    // id-ordered meanPool folds, fixed rounds) and emits every
    // codebook value as a (sub, code, pos, c) scalar row; the oracle
    // reads the SEQUENTIAL witness's codebooks. Bitwise double
    // equality — the id-ordered fold's point.
    "q149_pq_codebooks" -> QueryDef(
      s"""SELECT CAST(sub AS INT) AS sub, CAST(code AS INT) AS code,
         |       CAST(pos AS BIGINT) AS pos, c
         |FROM read_parquet('$IvfFixtureToken/pq_witness/codebooks/*.parquet')
         |ORDER BY sub, code, pos""".stripMargin) { (s, dir) =>
      implicit val sess: org.apache.spark.sql.SparkSession = s
      import s.implicits._
      ensurePqFixture(s, dir)
      val model = graft.operators.Pq.train(fixtureCorpus(s, dir), PqM, PqK)
      model.codebooks.zipWithIndex.flatMap { case (cb, sub) =>
        cb.zipWithIndex.flatMap { case (cw, code) =>
          cw.zipWithIndex.map { case (x, pos) => (sub, code, pos.toLong, x) }
        }
      }.toSeq.toDF("sub", "code", "pos", "c")
        .orderBy(col("sub"), col("code"), col("pos"))
    },

    // PQ ENCODE: every corpus vector reduced to m codeword ids (8 B at
    // dim 64 — the 64x corpus-copy cut). The oracle re-derives EVERY
    // code from the witness codebooks in DuckDB (argmin of the
    // re-computed subspace distances, ties to the lower code), so the
    // engine's one-pass encode kernel is checked against independent
    // arithmetic, not against itself.
    "q150_pq_codes" -> QueryDef(
      s"""WITH cb AS (SELECT CAST(sub AS INT) AS sub, CAST(code AS INT) AS code,
         |              list(c ORDER BY pos) AS cw
         |            FROM read_parquet('$IvfFixtureToken/pq_witness/codebooks/*.parquet')
         |            GROUP BY 1, 2),
         |e AS (SELECT vec_id, embedding FROM embeddings
         |      WHERE vec_id < $IvfFixtureCap),
         |sv AS (SELECT vec_id, CAST(s.sub AS INT) AS sub,
         |         embedding[CAST(s.sub*8+1 AS INT):CAST(s.sub*8+8 AS INT)] AS sv
         |       FROM e CROSS JOIN (SELECT unnest(range(8)) AS sub) s),
         |d AS (SELECT vec_id, sub, code,
         |        ${sqDistSql("sv", "cw")} AS dist
         |      FROM sv JOIN cb USING (sub)),
         |r AS (SELECT vec_id, sub, code,
         |        ROW_NUMBER() OVER (PARTITION BY vec_id, sub
         |          ORDER BY dist ASC, code ASC) AS rk FROM d)
         |SELECT vec_id AS id, sub, code FROM r WHERE rk = 1
         |ORDER BY id, sub""".stripMargin) { (s, dir) =>
      implicit val sess: org.apache.spark.sql.SparkSession = s
      ensurePqFixture(s, dir)
      val corpus = fixtureCorpus(s, dir)
      val model = graft.operators.Pq.train(corpus, PqM, PqK)
      graft.operators.Pq.encode(corpus, model)
        .select(col("id"), posexplode(col("codes")).as(Seq("sub", "code")))
        .select(col("id"), col("sub").cast("int").as("sub"),
          col("code").cast("int").as("code"))
        .orderBy(col("id"), col("sub"))
    },

    // PQ ADC top-k: the probe side — per-query subdistance tables, m
    // table lookups per candidate, top-k by (distance asc, id asc).
    // The oracle re-derives codes AND tables AND the ordered fold from
    // the witness codebooks (list_sum over a sub-ordered list matches
    // the kernel's ascending-subspace accumulation exactly), so the
    // whole asymmetric-distance pipeline is independently priced.
    "q151_pq_adc_topk" -> QueryDef(
      s"""WITH cb AS (SELECT CAST(sub AS INT) AS sub, CAST(code AS INT) AS code,
         |              list(c ORDER BY pos) AS cw
         |            FROM read_parquet('$IvfFixtureToken/pq_witness/codebooks/*.parquet')
         |            GROUP BY 1, 2),
         |e AS (SELECT vec_id, embedding FROM embeddings
         |      WHERE vec_id < $IvfFixtureCap),
         |sv AS (SELECT vec_id, CAST(s.sub AS INT) AS sub,
         |         embedding[CAST(s.sub*8+1 AS INT):CAST(s.sub*8+8 AS INT)] AS sv
         |       FROM e CROSS JOIN (SELECT unnest(range(8)) AS sub) s),
         |d AS (SELECT vec_id, sub, code,
         |        ${sqDistSql("sv", "cw")} AS dist
         |      FROM sv JOIN cb USING (sub)),
         |codes AS (SELECT vec_id, sub, code FROM (
         |  SELECT vec_id, sub, code,
         |         ROW_NUMBER() OVER (PARTITION BY vec_id, sub
         |           ORDER BY dist ASC, code ASC) AS rk FROM d) WHERE rk = 1),
         |q AS (SELECT vec_id AS query_id, embedding AS qv FROM e
         |      WHERE vec_id < 8),
         |tbl AS (SELECT query_id, cb.sub, cb.code,
         |          ${sqDistSql(
             "qv[CAST(cb.sub*8+1 AS INT):CAST(cb.sub*8+8 AS INT)]", "cw")} AS dist
         |        FROM q CROSS JOIN cb),
         |sc AS (SELECT t.query_id, c.vec_id AS neighbor_id,
         |         list_sum(list(t.dist ORDER BY t.sub)) AS adc_dist
         |       FROM codes c JOIN tbl t USING (sub, code)
         |       WHERE t.query_id <> c.vec_id
         |       GROUP BY 1, 2),
         |r AS (SELECT query_id, neighbor_id, adc_dist,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |          ORDER BY adc_dist ASC, neighbor_id ASC) AS INT) AS rank
         |      FROM sc)
         |SELECT query_id, neighbor_id, adc_dist, rank FROM r
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      implicit val sess: org.apache.spark.sql.SparkSession = s
      ensurePqFixture(s, dir)
      val corpus = fixtureCorpus(s, dir)
      val model = pqEngineModel(s, dir)
      val codes = graft.operators.Pq.encode(corpus, model)
      graft.operators.Pq.adcTopK(
        corpus.filter(col("vec_id") < 8), codes, model, kTop = 10)
        .select(col("query_id"), col("neighbor_id"), col("adc_dist"),
          col("rank").cast("int").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    },

    // IVF-PQ top-k — the FAISS IVFPQ layout, composed from the two
    // proven fixture chains: the query ranks the PERSISTED IVF
    // centroids and keeps its nprobe nearest lists (partition-pruned
    // reads against the list-partitioned layout), then ADC-scores only
    // those lists' candidates through the PQ code table (8 B/vector).
    // The oracle re-derives EVERYTHING from the two witness fixtures:
    // probe ranks from the IVF centroids parquet, codes from the PQ
    // witness codebooks, tables + the sub-ordered fold in DuckDB — the
    // whole composed pipeline independently priced.
    "q152_ivfpq_topk" -> QueryDef(
      s"""WITH cb AS (SELECT CAST(sub AS INT) AS sub, CAST(code AS INT) AS code,
         |              list(c ORDER BY pos) AS cw
         |            FROM read_parquet('$IvfFixtureToken/pq_witness/codebooks/*.parquet')
         |            GROUP BY 1, 2),
         |e AS (SELECT vec_id, embedding FROM embeddings
         |      WHERE vec_id < $IvfFixtureCap),
         |sv AS (SELECT vec_id, CAST(s.sub AS INT) AS sub,
         |         embedding[CAST(s.sub*8+1 AS INT):CAST(s.sub*8+8 AS INT)] AS sv
         |       FROM e CROSS JOIN (SELECT unnest(range(8)) AS sub) s),
         |dd AS (SELECT vec_id, sub, code,
         |        ${sqDistSql("sv", "cw")} AS dist
         |      FROM sv JOIN cb USING (sub)),
         |codes AS (SELECT vec_id, sub, code FROM (
         |  SELECT vec_id, sub, code,
         |         ROW_NUMBER() OVER (PARTITION BY vec_id, sub
         |           ORDER BY dist ASC, code ASC) AS rk FROM dd) WHERE rk = 1),
         |ivc AS (SELECT CAST(list_id AS INT) AS list_id, centroid
         |        FROM read_parquet('$IvfFixtureToken/centroids/*.parquet')),
         |a AS (SELECT id, CAST(list_id AS INT) AS list_id
         |      FROM read_parquet('$IvfFixtureToken/assignments/*/*.parquet',
         |                        hive_partitioning = true)),
         |q AS (SELECT vec_id AS query_id, embedding AS qv FROM e
         |      WHERE vec_id < 8),
         |cd AS (SELECT query_id, list_id,
         |         ${sqDistSql("qv", "centroid")} AS cdist
         |       FROM q CROSS JOIN ivc),
         |probes AS (SELECT query_id, list_id FROM (
         |  SELECT query_id, list_id,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY cdist ASC, list_id ASC) AS crank FROM cd)
         |  WHERE crank <= 4),
         |tbl AS (SELECT query_id, cb.sub, cb.code,
         |          ${sqDistSql(
             "qv[CAST(cb.sub*8+1 AS INT):CAST(cb.sub*8+8 AS INT)]", "cw")} AS dist
         |        FROM q CROSS JOIN cb),
         |cand AS (SELECT p.query_id, a.id FROM probes p JOIN a USING (list_id)
         |         WHERE p.query_id <> a.id),
         |sc AS (SELECT cand.query_id, cand.id AS neighbor_id,
         |         list_sum(list(t.dist ORDER BY t.sub)) AS adc_dist
         |       FROM cand
         |       JOIN codes c ON c.vec_id = cand.id
         |       JOIN tbl t ON t.query_id = cand.query_id
         |         AND t.sub = c.sub AND t.code = c.code
         |       GROUP BY 1, 2),
         |r AS (SELECT query_id, neighbor_id, adc_dist,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |          ORDER BY adc_dist ASC, neighbor_id ASC) AS INT) AS rank
         |      FROM sc)
         |SELECT query_id, neighbor_id, adc_dist, rank FROM r
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      implicit val sess: org.apache.spark.sql.SparkSession = s
      val fixture = ensureIvfFixture(s, dir)
      ensurePqFixture(s, dir)
      val corpus = fixtureCorpus(s, dir)
      val persisted = graft.operators.IvfAnn.read(s, fixture)
      val model = pqEngineModel(s, dir)
      val indexed = persisted.assignments.select(col("id"), col("list_id"))
        .join(graft.operators.Pq.encode(corpus, model), Seq("id"))
      graft.operators.Pq.ivfpqTopK(
        corpus.filter(col("vec_id") < 8), persisted.centroids, indexed,
        model, kTop = 10, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"), col("adc_dist"),
          col("rank").cast("int").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    },

    // RESIDUAL IVF-PQ (IVFADC, Jégou et al. 2011 § IV): codes quantize
    // r = v − c_list instead of v, so every list's codebook input is
    // centered near the origin — lower quantization error for the same
    // 8 B/vector, the FAISS IndexIVFPQ default. ADC tables become
    // per-(query, probed list) because the query residual differs per
    // list. The oracle re-derives EVERYTHING in DuckDB from the two
    // persisted witness fixtures: residuals from the index parquet
    // (v − centroid), codes from the residual witness codebooks,
    // per-(query, list) tables, and the sub-ordered fold — the full
    // residual pipeline independently priced.
    "q192_ivfpq_residual_topk" -> QueryDef(
      s"""WITH cb AS (SELECT CAST(sub AS INT) AS sub, CAST(code AS INT) AS code,
         |              list(c ORDER BY pos) AS cw
         |            FROM read_parquet('$IvfFixtureToken/pq_witness/residual_codebooks/*.parquet')
         |            GROUP BY 1, 2),
         |ivc AS (SELECT CAST(list_id AS INT) AS list_id, centroid
         |        FROM read_parquet('$IvfFixtureToken/centroids/*.parquet')),
         |a AS (SELECT id, v, CAST(list_id AS INT) AS list_id
         |      FROM read_parquet('$IvfFixtureToken/assignments/*/*.parquet',
         |                        hive_partitioning = true)),
         |rv AS (SELECT a.id, a.list_id,
         |         list_transform(list_zip(a.v, ivc.centroid),
         |           x -> CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) AS rv
         |       FROM a JOIN ivc USING (list_id)),
         |sv AS (SELECT id, CAST(s.sub AS INT) AS sub,
         |         rv[CAST(s.sub*8+1 AS INT):CAST(s.sub*8+8 AS INT)] AS sv
         |       FROM rv CROSS JOIN (SELECT unnest(range(8)) AS sub) s),
         |dd AS (SELECT id, sub, code,
         |        ${sqDistSql("sv", "cw")} AS dist
         |      FROM sv JOIN cb USING (sub)),
         |codes AS (SELECT id, sub, code FROM (
         |  SELECT id, sub, code,
         |         ROW_NUMBER() OVER (PARTITION BY id, sub
         |           ORDER BY dist ASC, code ASC) AS rk FROM dd) WHERE rk = 1),
         |e AS (SELECT vec_id, embedding FROM embeddings
         |      WHERE vec_id < $IvfFixtureCap),
         |q AS (SELECT vec_id AS query_id, embedding AS qv FROM e
         |      WHERE vec_id < 8),
         |cd AS (SELECT query_id, list_id,
         |         ${sqDistSql("qv", "centroid")} AS cdist
         |       FROM q CROSS JOIN ivc),
         |probes AS (SELECT query_id, list_id FROM (
         |  SELECT query_id, list_id,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY cdist ASC, list_id ASC) AS crank FROM cd)
         |  WHERE crank <= 4),
         |qrv AS (SELECT p.query_id, p.list_id,
         |          list_transform(list_zip(q.qv, ivc.centroid),
         |            x -> CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) AS qrv
         |        FROM probes p JOIN q USING (query_id) JOIN ivc USING (list_id)),
         |tbl AS (SELECT query_id, list_id, cb.sub, cb.code,
         |          ${sqDistSql(
             "qrv[CAST(cb.sub*8+1 AS INT):CAST(cb.sub*8+8 AS INT)]", "cw")} AS dist
         |        FROM qrv CROSS JOIN cb),
         |cand AS (SELECT p.query_id, a.id, a.list_id
         |         FROM probes p JOIN a USING (list_id)
         |         WHERE p.query_id <> a.id),
         |sc AS (SELECT cand.query_id, cand.id AS neighbor_id,
         |         list_sum(list(t.dist ORDER BY t.sub)) AS adc_dist
         |       FROM cand
         |       JOIN codes c ON c.id = cand.id
         |       JOIN tbl t ON t.query_id = cand.query_id
         |         AND t.list_id = cand.list_id
         |         AND t.sub = c.sub AND t.code = c.code
         |       GROUP BY 1, 2),
         |r AS (SELECT query_id, neighbor_id, adc_dist,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |          ORDER BY adc_dist ASC, neighbor_id ASC) AS INT) AS rank
         |      FROM sc)
         |SELECT query_id, neighbor_id, adc_dist, rank FROM r
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      implicit val sess: org.apache.spark.sql.SparkSession = s
      val fixture = ensureIvfFixture(s, dir)
      ensureResidualPqFixture(s, dir)
      val persisted = graft.operators.IvfAnn.read(s, fixture)
      val rv = graft.operators.Pq.residuals(
        persisted.assignments, persisted.centroids)
      val model = residualEngineModel(s, dir)
      val indexed = persisted.assignments.select(col("id"), col("list_id"))
        .join(graft.operators.Pq.encode(rv, model,
          idCol = "id", vecCol = "rv"), Seq("id"))
      graft.operators.Pq.ivfpqResidualTopK(
        fixtureCorpus(s, dir).filter(col("vec_id") < 8),
        persisted.centroids, indexed, model, kTop = 10, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"), col("adc_dist"),
          col("rank").cast("int").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    },

    // IVFADC+R (Jégou et al. 2011 § V): the residual-ADC probe keeps a
    // 3× shortlist, then ONLY those ids' raw vectors are fetched and
    // re-ranked by exact squared L2 — the compressed scan prices the
    // corpus at 8 B/vector, the exact pass touches |q|·R rows. The
    // oracle re-derives the full chain (q192's pipeline at R = 30,
    // then the exact re-rank from the raw embeddings) in DuckDB.
    "q193_ivfpq_refine" -> QueryDef(
      s"""WITH cb AS (SELECT CAST(sub AS INT) AS sub, CAST(code AS INT) AS code,
         |              list(c ORDER BY pos) AS cw
         |            FROM read_parquet('$IvfFixtureToken/pq_witness/residual_codebooks/*.parquet')
         |            GROUP BY 1, 2),
         |ivc AS (SELECT CAST(list_id AS INT) AS list_id, centroid
         |        FROM read_parquet('$IvfFixtureToken/centroids/*.parquet')),
         |a AS (SELECT id, v, CAST(list_id AS INT) AS list_id
         |      FROM read_parquet('$IvfFixtureToken/assignments/*/*.parquet',
         |                        hive_partitioning = true)),
         |rv AS (SELECT a.id, a.list_id,
         |         list_transform(list_zip(a.v, ivc.centroid),
         |           x -> CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) AS rv
         |       FROM a JOIN ivc USING (list_id)),
         |sv AS (SELECT id, CAST(s.sub AS INT) AS sub,
         |         rv[CAST(s.sub*8+1 AS INT):CAST(s.sub*8+8 AS INT)] AS sv
         |       FROM rv CROSS JOIN (SELECT unnest(range(8)) AS sub) s),
         |dd AS (SELECT id, sub, code,
         |        ${sqDistSql("sv", "cw")} AS dist
         |      FROM sv JOIN cb USING (sub)),
         |codes AS (SELECT id, sub, code FROM (
         |  SELECT id, sub, code,
         |         ROW_NUMBER() OVER (PARTITION BY id, sub
         |           ORDER BY dist ASC, code ASC) AS rk FROM dd) WHERE rk = 1),
         |e AS (SELECT vec_id, embedding FROM embeddings
         |      WHERE vec_id < $IvfFixtureCap),
         |q AS (SELECT vec_id AS query_id, embedding AS qv FROM e
         |      WHERE vec_id < 8),
         |cd AS (SELECT query_id, list_id,
         |         ${sqDistSql("qv", "centroid")} AS cdist
         |       FROM q CROSS JOIN ivc),
         |probes AS (SELECT query_id, list_id FROM (
         |  SELECT query_id, list_id,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY cdist ASC, list_id ASC) AS crank FROM cd)
         |  WHERE crank <= 4),
         |qrv AS (SELECT p.query_id, p.list_id,
         |          list_transform(list_zip(q.qv, ivc.centroid),
         |            x -> CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) AS qrv
         |        FROM probes p JOIN q USING (query_id) JOIN ivc USING (list_id)),
         |tbl AS (SELECT query_id, list_id, cb.sub, cb.code,
         |          ${sqDistSql(
             "qrv[CAST(cb.sub*8+1 AS INT):CAST(cb.sub*8+8 AS INT)]", "cw")} AS dist
         |        FROM qrv CROSS JOIN cb),
         |cand AS (SELECT p.query_id, a.id, a.list_id
         |         FROM probes p JOIN a USING (list_id)
         |         WHERE p.query_id <> a.id),
         |sc AS (SELECT cand.query_id, cand.id AS neighbor_id,
         |         list_sum(list(t.dist ORDER BY t.sub)) AS adc_dist
         |       FROM cand
         |       JOIN codes c ON c.id = cand.id
         |       JOIN tbl t ON t.query_id = cand.query_id
         |         AND t.list_id = cand.list_id
         |         AND t.sub = c.sub AND t.code = c.code
         |       GROUP BY 1, 2),
         |short AS (SELECT query_id, neighbor_id, adc_dist FROM (
         |  SELECT query_id, neighbor_id, adc_dist,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY adc_dist ASC, neighbor_id ASC) AS rk FROM sc)
         |  WHERE rk <= 30),
         |ex AS (SELECT s.query_id, s.neighbor_id, s.adc_dist,
         |         ${sqDistSql("q.qv", "e2.embedding")} AS exact_dist
         |       FROM short s JOIN q ON q.query_id = s.query_id
         |       JOIN e e2 ON e2.vec_id = s.neighbor_id),
         |r AS (SELECT query_id, neighbor_id, exact_dist, adc_dist,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |          ORDER BY exact_dist ASC, neighbor_id ASC) AS INT) AS rank
         |      FROM ex)
         |SELECT query_id, neighbor_id, exact_dist, adc_dist, rank FROM r
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      implicit val sess: org.apache.spark.sql.SparkSession = s
      val fixture = ensureIvfFixture(s, dir)
      ensureResidualPqFixture(s, dir)
      val persisted = graft.operators.IvfAnn.read(s, fixture)
      val rv = graft.operators.Pq.residuals(
        persisted.assignments, persisted.centroids)
      val model = residualEngineModel(s, dir)
      val indexed = persisted.assignments.select(col("id"), col("list_id"))
        .join(graft.operators.Pq.encode(rv, model,
          idCol = "id", vecCol = "rv"), Seq("id"))
      val corpus = fixtureCorpus(s, dir)
      val queries = corpus.filter(col("vec_id") < 8)
      val short = graft.operators.Pq.ivfpqResidualTopK(
        queries, persisted.centroids, indexed, model, kTop = 30, nprobe = 4)
      graft.operators.Pq.refineExact(short, queries, corpus, kTop = 10)
        .select(col("query_id"), col("neighbor_id"), col("exact_dist"),
          col("adc_dist"), col("rank").cast("int").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    },

    // Deterministic top principal component (power iteration on the
    // integer-exact scatter matrix): quantize half-up at 2^10, sum
    // S_ij/s_i in DECIMAL(38,0)/HUGEINT, M = n·S − s·sᵀ exact and
    // < 2^53 by a loud guard (the int→double conversion is then exact
    // on both engines), ten unrolled iterations with ascending folds —
    // the q163 discipline transplanted to eigen-analysis. One narrow
    // corpus pass; 4 KB of driver state.
    "q196_pca_top_component" -> QueryDef({
      val lvl = (1 to 10).map { k =>
        s"""y$k AS MATERIALIZED (SELECT m.i AS j,
           |  list_sum(list(m.c * x.xv ORDER BY m.j)) AS yv
           |  FROM mfull m JOIN it${k - 1} x ON x.j = m.j GROUP BY m.i),
           |n$k AS (SELECT sqrt(list_sum(list(yv * yv ORDER BY j))) AS nrm
           |        FROM y$k),
           |it$k AS MATERIALIZED (SELECT j, yv / nrm AS xv FROM y$k, n$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
         |           WHERE vec_id < 65536),
         |x0 AS MATERIALIZED (SELECT vec_id, CAST(u.i AS INT) AS i,
         |         CAST(floor(CAST(embedding[CAST(u.i + 1 AS INT)] AS DOUBLE)
         |              * 1024 + 0.5) AS BIGINT) AS q
         |       FROM e, unnest(range(len(embedding))) u(i)),
         |nn AS (SELECT count(*) AS n FROM e),
         |s AS (SELECT i, CAST(sum(q) AS HUGEINT) AS si FROM x0 GROUP BY i),
         |sp AS (SELECT a.i AS i, b.i AS j,
         |         CAST(sum(CAST(a.q AS HUGEINT) * b.q) AS HUGEINT) AS sij
         |       FROM x0 a JOIN x0 b ON a.vec_id = b.vec_id AND b.i >= a.i
         |       GROUP BY 1, 2),
         |mm AS (SELECT sp.i, sp.j,
         |         CAST(nn.n * sp.sij - sa.si * sb.si AS DOUBLE) AS c
         |       FROM sp CROSS JOIN nn
         |       JOIN s sa ON sa.i = sp.i JOIN s sb ON sb.i = sp.j),
         |mfull AS MATERIALIZED (SELECT i, j, c FROM mm UNION ALL
         |          SELECT j AS i, i AS j, c FROM mm WHERE i <> j),
         |it0 AS MATERIALIZED (SELECT i AS j, 1.0 AS xv FROM s),
         |$lvl,
         |yf AS (SELECT m.i AS j,
         |         list_sum(list(m.c * x.xv ORDER BY m.j)) AS yv
         |       FROM mfull m JOIN it10 x ON x.j = m.j GROUP BY m.i),
         |ray AS (SELECT list_sum(list(x.xv * y.yv ORDER BY x.j)) /
         |               list_sum(list(x.xv * x.xv ORDER BY x.j)) AS eigval
         |        FROM it10 x JOIN yf y ON y.j = x.j)
         |SELECT CAST(x.j AS BIGINT) AS pos, x.xv AS pc, ray.eigval
         |FROM it10 x CROSS JOIN ray ORDER BY pos""".stripMargin
    }) { (s, dir) =>
      graft.operators.Pca.topComponent(
        Tables(s, dir).embeddings.filter(col("vec_id") < 65536))
        .orderBy(col("pos"))
    },

    // Top-2 PCA projection: Hotelling deflation (M ← M − λ·x·xᵀ, the
    // fixed (λ·x_i)·x_j association) gives PC2 from the same exact
    // scatter, then ONE narrow codegen'd pass projects every vector —
    // c_t = (Σ_j (n·q_j − s_j)·x_t[j]) / n keeps mean-centering in
    // exact integers (no rational mean) so both engines fold identical
    // doubles. The oracle runs BOTH ten-level chains and the deflation
    // in unrolled MATERIALIZED CTEs.
    "q197_pca_project" -> QueryDef({
      def chain(tag: String, mat: String): String = (1 to 10).map { k =>
        s"""y$tag$k AS MATERIALIZED (SELECT m.i AS j,
           |  list_sum(list(m.c * x.xv ORDER BY m.j)) AS yv
           |  FROM $mat m JOIN it$tag${k - 1} x ON x.j = m.j GROUP BY m.i),
           |n$tag$k AS (SELECT sqrt(list_sum(list(yv * yv ORDER BY j)))
           |            AS nrm FROM y$tag$k),
           |it$tag$k AS MATERIALIZED (SELECT j, yv / nrm AS xv
           |                          FROM y$tag$k, n$tag$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
         |           WHERE vec_id < 65536),
         |x0 AS MATERIALIZED (SELECT vec_id, CAST(u.i AS INT) AS i,
         |         CAST(floor(CAST(embedding[CAST(u.i + 1 AS INT)] AS DOUBLE)
         |              * 1024 + 0.5) AS BIGINT) AS q
         |       FROM e, unnest(range(len(embedding))) u(i)),
         |nn AS (SELECT count(*) AS n FROM e),
         |s AS MATERIALIZED (SELECT i, CAST(sum(q) AS HUGEINT) AS si
         |                   FROM x0 GROUP BY i),
         |sp AS (SELECT a.i AS i, b.i AS j,
         |         CAST(sum(CAST(a.q AS HUGEINT) * b.q) AS HUGEINT) AS sij
         |       FROM x0 a JOIN x0 b ON a.vec_id = b.vec_id AND b.i >= a.i
         |       GROUP BY 1, 2),
         |mm AS (SELECT sp.i, sp.j,
         |         CAST(nn.n * sp.sij - sa.si * sb.si AS DOUBLE) AS c
         |       FROM sp CROSS JOIN nn
         |       JOIN s sa ON sa.i = sp.i JOIN s sb ON sb.i = sp.j),
         |mfull AS MATERIALIZED (SELECT i, j, c FROM mm UNION ALL
         |          SELECT j AS i, i AS j, c FROM mm WHERE i <> j),
         |ita0 AS MATERIALIZED (SELECT i AS j, 1.0 AS xv FROM s),
         |${chain("a", "mfull")},
         |yfa AS (SELECT m.i AS j,
         |          list_sum(list(m.c * x.xv ORDER BY m.j)) AS yv
         |        FROM mfull m JOIN ita10 x ON x.j = m.j GROUP BY m.i),
         |raya AS (SELECT list_sum(list(x.xv * y.yv ORDER BY x.j)) /
         |                list_sum(list(x.xv * x.xv ORDER BY x.j)) AS eig
         |         FROM ita10 x JOIN yfa y ON y.j = x.j),
         |m2 AS MATERIALIZED (SELECT m.i, m.j,
         |        m.c - raya.eig * xa.xv * xb.xv AS c
         |      FROM mfull m JOIN ita10 xa ON xa.j = m.i
         |                   JOIN ita10 xb ON xb.j = m.j
         |      CROSS JOIN raya),
         |itb0 AS MATERIALIZED (SELECT i AS j, 1.0 AS xv FROM s),
         |${chain("b", "m2")},
         |proj AS (SELECT x0.vec_id,
         |  list_sum(list((CAST(nn.n AS DOUBLE) * x0.q
         |    - CAST(s.si AS DOUBLE)) * xa.xv ORDER BY x0.i))
         |    / CAST(nn.n AS DOUBLE) AS c1,
         |  list_sum(list((CAST(nn.n AS DOUBLE) * x0.q
         |    - CAST(s.si AS DOUBLE)) * xb.xv ORDER BY x0.i))
         |    / CAST(nn.n AS DOUBLE) AS c2
         |  FROM x0 JOIN s USING (i)
         |       JOIN ita10 xa ON xa.j = x0.i
         |       JOIN itb10 xb ON xb.j = x0.i
         |  CROSS JOIN nn
         |  GROUP BY x0.vec_id, nn.n)
         |SELECT vec_id, c1, c2 FROM proj ORDER BY vec_id""".stripMargin
    }) { (s, dir) =>
      graft.operators.Pca.project(
        Tables(s, dir).embeddings.filter(col("vec_id") < 65536), k = 2)
        .select(col("id").as("vec_id"), col("c1"), col("c2"))
        .orderBy(col("vec_id"))
    },

    // ROUNDED-regime PCA serve — the past-the-2^53-ceiling path q196
    // cannot take: vectors scaled by 2^20 (exact: a power-of-two double
    // product only shifts the exponent) push n²·qmax² to ~2^78, so
    // every scatter cell is a >53-bit integer the exact mode refuses.
    // The rounded contract is signif53: truncate each exact HUGEINT/
    // BigInt cell to its top 53 significant bits (abs >> shift << shift,
    // sign back — pure integer arithmetic) and only then convert, which
    // is exact on BOTH engines. (Round-to-nearest is NOT portable:
    // DuckDB's HUGEINT→DOUBLE double-rounds via upper·2^64 + lower and
    // lands 1 ulp off true nearest on ~5% of these cells — measured
    // this round.) Ten power-iteration levels then run bit-identical
    // from bit-identical inputs. NO vec_id cap: this is the serving
    // mode the unbounded moment store exists for (PcaSpec pins
    // rounded == exact below the ceiling).
    "q202_pca_rounded_top_component" -> QueryDef({
      val lvl = (1 to 10).map { k =>
        s"""y$k AS MATERIALIZED (SELECT m.i AS j,
           |  list_sum(list(m.c * x.xv ORDER BY m.j)) AS yv
           |  FROM mfull m JOIN it${k - 1} x ON x.j = m.j GROUP BY m.i),
           |n$k AS (SELECT sqrt(list_sum(list(yv * yv ORDER BY j))) AS nrm
           |        FROM y$k),
           |it$k AS MATERIALIZED (SELECT j, yv / nrm AS xv FROM y$k, n$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |x0 AS MATERIALIZED (SELECT vec_id, CAST(u.i AS INT) AS i,
         |         CAST(floor(CAST(embedding[CAST(u.i + 1 AS INT)] AS DOUBLE)
         |              * 1048576 * 1024 + 0.5) AS BIGINT) AS q
         |       FROM e, unnest(range(len(embedding))) u(i)),
         |nn AS (SELECT count(*) AS n FROM e),
         |s AS (SELECT i, CAST(sum(q) AS HUGEINT) AS si FROM x0 GROUP BY i),
         |sp AS (SELECT a.i AS i, b.i AS j,
         |         CAST(sum(CAST(a.q AS HUGEINT) * b.q) AS HUGEINT) AS sij
         |       FROM x0 a JOIN x0 b ON a.vec_id = b.vec_id AND b.i >= a.i
         |       GROUP BY 1, 2),
         |mi AS (SELECT sp.i, sp.j,
         |         nn.n * sp.sij - sa.si * sb.si AS m
         |       FROM sp CROSS JOIN nn
         |       JOIN s sa ON sa.i = sp.i JOIN s sb ON sb.i = sp.j),
         |mm AS (SELECT i, j, CASE
         |         WHEN length(bin(abs(m))) <= 53 THEN CAST(m AS DOUBLE)
         |         ELSE CAST(sign(m) AS DOUBLE) * CAST(
         |           (abs(m) >> (length(bin(abs(m))) - 53))
         |             << (length(bin(abs(m))) - 53) AS DOUBLE)
         |       END AS c
         |       FROM mi),
         |mfull AS MATERIALIZED (SELECT i, j, c FROM mm UNION ALL
         |          SELECT j AS i, i AS j, c FROM mm WHERE i <> j),
         |it0 AS MATERIALIZED (SELECT i AS j, 1.0 AS xv FROM s),
         |$lvl,
         |yf AS (SELECT m.i AS j,
         |         list_sum(list(m.c * x.xv ORDER BY m.j)) AS yv
         |       FROM mfull m JOIN it10 x ON x.j = m.j GROUP BY m.i),
         |ray AS (SELECT list_sum(list(x.xv * y.yv ORDER BY x.j)) /
         |               list_sum(list(x.xv * x.xv ORDER BY x.j)) AS eigval
         |        FROM it10 x JOIN yf y ON y.j = x.j)
         |SELECT CAST(x.j AS BIGINT) AS pos, x.xv AS pc, ray.eigval
         |FROM it10 x CROSS JOIN ray ORDER BY pos""".stripMargin
    }) { (s, dir) =>
      // ×2^20 per element BEFORE the quantizer's ×2^10: both are exact
      // power-of-two double products, so the composed q = floor(v·2^30
      // + 0.5) is identical arithmetic on both engines
      val scaled = Tables(s, dir).embeddings
        .select(col("vec_id"), transform(col("embedding"),
          x => x.cast("double") * lit(1048576.0)).as("embedding"))
      graft.operators.Pca.topComponentFromCells(
        graft.operators.Pca.momentCells(scaled), rounded = true)
        .orderBy(col("pos"))
    },

    // Johnson–Lindenstrauss ±1 projection (Achlioptas): dim 64 → 16
    // exact-integer coordinates in one narrow pass — signs are a pure
    // splitmix64 function of (t, j), inputs the q196 quantization, so
    // every coordinate is an order-free integer sum. The oracle joins
    // the sign fixture and re-sums in HUGEINT.
    "q198_jl_project" -> QueryDef(
      s"""WITH sg AS (SELECT CAST(t AS INT) AS t, CAST(j AS INT) AS j,
         |              CAST(s AS BIGINT) AS s
         |            FROM read_parquet('$IvfFixtureToken/jl_signs/*.parquet')),
         |e AS (SELECT vec_id, embedding FROM embeddings
         |      WHERE vec_id < $IvfFixtureCap),
         |x0 AS (SELECT vec_id, CAST(u.i AS INT) AS j,
         |         CAST(floor(CAST(embedding[CAST(u.i + 1 AS INT)] AS DOUBLE)
         |              * 1024 + 0.5) AS BIGINT) AS q
         |       FROM e, unnest(range(len(embedding))) u(i))
         |SELECT x0.vec_id, CAST(sg.t AS BIGINT) AS pos,
         |       CAST(sum(sg.s * x0.q) AS BIGINT) AS coord
         |FROM x0 JOIN sg USING (j)
         |GROUP BY 1, 2 ORDER BY vec_id, pos""".stripMargin) { (s, dir) =>
      ensureJlFixture(s, dir)
      // posexplode_outer: the non-outer generate makes Catalyst infer a
      // size(proj) > 0 filter whose pushdown INLINES the projection
      // expression below the hoisting Project — the 16 folds then
      // re-evaluate the quantization per element lookup (measured 154 s
      // vs 1.5 s at sf1.0). The arrays are never null/empty, so outer
      // is value-identical.
      graft.operators.Jl.project(
        Tables(s, dir).embeddings.filter(col("vec_id") < IvfFixtureCap),
        JlTargetDim, JlDim)
        .select(col("id").as("vec_id"),
          posexplode_outer(col("proj")).as(Seq("pos", "coord")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          col("coord"))
        .orderBy(col("vec_id"), col("pos"))
    },

    // Coarse-to-fine ANN through the JL projection: exact integer
    // squared-L2 ranks a 4×-narrower scan, the 30-deep shortlist
    // re-ranks at full-width cosine — the third refine variant beside
    // q194 (prefix dims) and q193 (PQ codes). The oracle re-derives
    // projections, coarse distances, and both rankings from the sign
    // fixture.
    "q199_jl_topk" -> QueryDef(
      s"""WITH sg AS (SELECT CAST(t AS INT) AS t, CAST(j AS INT) AS j,
         |              CAST(s AS BIGINT) AS s
         |            FROM read_parquet('$IvfFixtureToken/jl_signs/*.parquet')),
         |e AS (SELECT vec_id, embedding FROM embeddings
         |      WHERE vec_id < $IvfFixtureCap),
         |x0 AS (SELECT vec_id, CAST(u.i AS INT) AS j,
         |         CAST(floor(CAST(embedding[CAST(u.i + 1 AS INT)] AS DOUBLE)
         |              * 1024 + 0.5) AS BIGINT) AS q
         |       FROM e, unnest(range(len(embedding))) u(i)),
         |pv AS (SELECT vec_id, list(CAST(cd AS DOUBLE) ORDER BY t) AS pj
         |       FROM (SELECT x0.vec_id, sg.t, sum(sg.s * x0.q) AS cd
         |             FROM x0 JOIN sg USING (j) GROUP BY 1, 2)
         |       GROUP BY vec_id),
         |qs AS (SELECT vec_id AS query_id, pj AS qpj FROM pv
         |       WHERE vec_id < 10),
         |coarse AS (SELECT qs.query_id, pv.vec_id AS neighbor_id,
         |             ${sqDistSql("qs.qpj", "pv.pj")} AS jl_dist
         |           FROM pv CROSS JOIN qs
         |           WHERE pv.vec_id <> qs.query_id),
         |short AS (SELECT query_id, neighbor_id, jl_dist FROM (
         |  SELECT query_id, neighbor_id, jl_dist,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY jl_dist ASC, neighbor_id ASC) AS crank
         |  FROM coarse) WHERE crank <= 30),
         |fine AS (SELECT s.query_id, s.neighbor_id, s.jl_dist,
         |           ${cosineSql("eq.embedding", "ec.embedding")} AS cosine
         |         FROM short s
         |         JOIN e eq ON eq.vec_id = s.query_id
         |         JOIN e ec ON ec.vec_id = s.neighbor_id),
         |r AS (SELECT query_id, neighbor_id, cosine, jl_dist,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |          ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
         |      FROM fine)
         |SELECT query_id, neighbor_id, cosine, jl_dist, rank FROM r
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      ensureJlFixture(s, dir)
      val e = Tables(s, dir).embeddings.filter(col("vec_id") < IvfFixtureCap)
      graft.operators.Jl.jlTopK(e.filter(col("vec_id") < 10), e,
        JlTargetDim, JlDim, shortK = 30, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("cosine"),
          col("jl_dist"), col("rank").cast("int").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    },

    // Symmetric int8 quantization of the embedding column: per-vector
    // scale = max|x|/127, code = floor(x/scale + 0.5) — the explicit
    // half-up formula, NOT an engine round(), so both engines compute
    // identical codes; err = |code*scale - x| is the per-dimension
    // dequantization error (same double arithmetic both sides). The 4×
    // storage cut is the point at corpus scale; one-pass native kernel.
    "q91_embedding_quantize" -> QueryDef(
      """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 400),
        |m AS (SELECT vec_id, embedding,
        |        list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
        |      FROM e),
        |s AS (SELECT vec_id, embedding,
        |        CASE WHEN maxabs > 0 THEN maxabs / 127.0 ELSE 0.0 END AS scale
        |      FROM m),
        |c AS (SELECT vec_id, scale,
        |        CASE WHEN isnan(scale)
        |             THEN list_transform(embedding,
        |                  x -> CASE WHEN x IS NULL THEN NULL ELSE 0 END)
        |             WHEN scale > 0
        |             THEN list_transform(embedding,
        |                  x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS INT))
        |             ELSE list_transform(embedding,
        |                  x -> CASE WHEN x IS NULL THEN NULL ELSE 0 END) END AS codes,
        |        embedding
        |      FROM s)
        |SELECT vec_id, i AS pos, codes[CAST(i+1 AS INT)] AS code, scale,
        |       abs(codes[CAST(i+1 AS INT)] * scale
        |           - CAST(embedding[CAST(i+1 AS INT)] AS DOUBLE)) AS err
        |FROM c, unnest(range(len(embedding))) AS u(i)
        |ORDER BY vec_id, pos""".stripMargin) { (s, dir) =>
      import graft.operators.Embeddings
      Tables(s, dir).embeddings.filter(col("vec_id") < 400)
        .select(col("vec_id"), col("embedding"),
          Embeddings.quantizeInt8(col("embedding")).as("qz"))
        .select(col("vec_id"), col("qz.scale").as("scale"),
          posexplode(arrays_zip(col("qz.codes").as("code"), col("embedding").as("x")))
            .as(Seq("pos", "zp")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          col("zp.code").as("code"), col("scale"),
          abs(col("zp.code") * col("scale") - col("zp.x").cast("double")).as("err"))
        .orderBy(col("vec_id"), col("pos"))
    },

    // Per-dimension (per-channel) int8 quantization: scale_d =
    // max|x_d|/127 across the corpus — the robust production scheme when
    // a few embedding channels carry outliers. Scales come from one
    // narrow posexplode->max pass (order-independent) and ride as a
    // plan-time literal vector, the same driver-side-constant shape as
    // the IVF centroids.
    "q95_perdim_quantize" -> QueryDef(
      """WITH s AS (SELECT i AS pos,
        |        max(abs(CAST(embedding[CAST(i+1 AS INT)] AS DOUBLE))) AS m
        |      FROM embeddings, unnest(range(len(embedding))) AS u(i) GROUP BY 1),
        |sc AS (SELECT pos, CASE WHEN m > 0 AND NOT isnan(m)
        |                        THEN m / 127.0 ELSE 0.0 END AS scale
        |       FROM s),
        |x AS (SELECT vec_id, i AS pos,
        |        CAST(embedding[CAST(i+1 AS INT)] AS DOUBLE) AS v
        |      FROM embeddings, unnest(range(len(embedding))) AS u(i))
        |SELECT x.vec_id, x.pos,
        |  CASE WHEN sc.scale > 0 THEN CAST(floor(x.v / sc.scale + 0.5) AS INT)
        |       WHEN x.v IS NULL THEN NULL ELSE 0 END AS code,
        |  sc.scale
        |FROM x JOIN sc USING (pos)
        |ORDER BY vec_id, pos""".stripMargin) { (s, dir) =>
      import graft.operators.Embeddings
      val e = Tables(s, dir).embeddings
      val scales = Embeddings.perDimScales(e)
      Embeddings.quantizePerDim(e, scales)
        .select(col("vec_id"),
          posexplode(arrays_zip(col("codes").as("code"),
            typedlit(scales).as("scale"))).as(Seq("pos", "zp")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          col("zp.code").as("code"), col("zp.scale").as("scale"))
        .orderBy(col("vec_id"), col("pos"))
    },

    // Per-source embedding centroids: the semantic-mix monitor — one
    // mean vector per corpus source. The (doc_id, source) projection is
    // O(corpus), NOT a broadcastable dim: the join hashes both sides on
    // id (AQE broadcasts at test scale; sort-merge at 100 TB, where
    // co-partitioned snapshots elide the exchange). Same deterministic
    // id-ordered fold as q61; drift of these centroids between
    // snapshots flags a source changing meaning, not just volume.
    "q86_source_centroids" -> QueryDef(
      """WITH x AS (
        |  SELECT d.source AS g, e.vec_id,
        |         i AS pos, e.embedding[CAST(i+1 AS INT)] AS v
        |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id,
        |       unnest(range(len(e.embedding))) AS u(i))
        |SELECT g, pos,
        |       list_sum(list(CAST(v AS DOUBLE) ORDER BY vec_id)) / count(*) AS mean,
        |       count(*) AS n
        |FROM x GROUP BY g, pos ORDER BY g, pos""".stripMargin) { (s, dir) =>
      import graft.operators.Embeddings
      val t = Tables(s, dir)
      val joined = t.embeddings.join(
        t.documents.select(col("doc_id").as("vec_id"), col("source")),
        Seq("vec_id"))
      Embeddings.meanPool(joined, col("source"))
        .select(col("g"), col("pos").cast("long").as("pos"),
          col("mean"), col("n"))
        .orderBy(col("g"), col("pos"))
    },

    // Morton (Z-order) codes over two bucketed dimensions — the layout
    // key behind Layout.zorderWrite's multi-dimensional file clustering.
    // Pure native bit arithmetic (shift/and/or compose into one
    // whole-stage-codegen expression; no UDF, no kernel), reproduced
    // bit-for-bit by DuckDB integer ops.
    "q93_zorder_code" -> QueryDef(
      """SELECT event_id,
        |  CAST(list_sum(list_transform(range(10), i ->
        |    (((user_id % 1024) >> CAST(i AS INT)) & 1)
        |      * (CAST(1 AS BIGINT) << CAST(2*i AS INT))
        |    + (((event_id % 1024) >> CAST(i AS INT)) & 1)
        |      * (CAST(1 AS BIGINT) << CAST(2*i+1 AS INT))
        |  )) AS BIGINT) AS z
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      import graft.operators.Layout
      Tables(s, dir).events
        .select(col("event_id"),
          Layout.mortonCode(col("user_id") % 1024, col("event_id") % 1024, 10).as("z"))
        .orderBy(col("event_id"))
    },

    // Ordered conversion funnel view -> click -> purchase: per user, the
    // earliest step-1 event, then each later step's earliest event
    // strictly after the previous step's time. Every stage keys on
    // user_id (one logical shuffle key end-to-end; the per-step tables
    // shrink monotonically and broadcast). Timestamps emitted as
    // formatted strings per the determinism rules.
    "q92_event_funnel" -> QueryDef(
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |       JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |       JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
        |SELECT s1.user_id,
        |       strftime(s1.t1, '%Y-%m-%d %H:%M:%S') AS view_ts,
        |       strftime(s2.t2, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |       strftime(s3.t3, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |       (1 + CASE WHEN s2.t2 IS NOT NULL THEN 1 ELSE 0 END
        |          + CASE WHEN s3.t3 IS NOT NULL THEN 1 ELSE 0 END) AS steps_reached
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY s1.user_id""".stripMargin) { (s, dir) =>
      import graft.operators.Funnel
      val ev = Tables(s, dir).events
      Funnel.funnel(ev, "user_id", "ts", Seq(
        "view" -> (col("event_type") === "view"),
        "click" -> (col("event_type") === "click"),
        "purchase" -> (col("event_type") === "purchase")))
        .select(col("user_id"),
          date_format(col("view_ts"), "yyyy-MM-dd HH:mm:ss").as("view_ts"),
          date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          col("steps_reached"))
        .orderBy(col("user_id"))
    },

    // Conversion-window funnel: same ordered funnel as q92, but every
    // later step must land within 3 days of the user's step-1 time —
    // epoch-millis arithmetic on both engines (the q56 precedent).
    "q96_windowed_funnel" -> QueryDef(
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |       JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts > s1.t1
        |         AND epoch_ms(e.ts) - epoch_ms(s1.t1) <= 259200000 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |       JOIN s2 USING (user_id) JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |         AND epoch_ms(e.ts) - epoch_ms(s1.t1) <= 259200000 GROUP BY 1)
        |SELECT s1.user_id,
        |       strftime(s1.t1, '%Y-%m-%d %H:%M:%S') AS view_ts,
        |       strftime(s2.t2, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |       strftime(s3.t3, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |       (1 + CASE WHEN s2.t2 IS NOT NULL THEN 1 ELSE 0 END
        |          + CASE WHEN s3.t3 IS NOT NULL THEN 1 ELSE 0 END) AS steps_reached
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY s1.user_id""".stripMargin) { (s, dir) =>
      import graft.operators.Funnel
      Funnel.funnel(Tables(s, dir).events, "user_id", "ts", Seq(
        "view" -> (col("event_type") === "view"),
        "click" -> (col("event_type") === "click"),
        "purchase" -> (col("event_type") === "purchase")),
        windowMillis = Some(259200000L))
        .select(col("user_id"),
          date_format(col("view_ts"), "yyyy-MM-dd HH:mm:ss").as("view_ts"),
          date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          col("steps_reached"))
        .orderBy(col("user_id"))
    },

    // Event transition matrix: consecutive-pair counts per user (the
    // sankey/Markov edge weights). One lag window per user (bounded by
    // that user's event count), then a map-side-combinable count over
    // the tiny (from, to) key space.
    "q99_event_transitions" -> QueryDef(
      """WITH s AS (SELECT user_id, event_type,
        |       lag(event_type) OVER (PARTITION BY user_id
        |                             ORDER BY ts, event_id) AS prev
        |     FROM events)
        |SELECT prev AS from_type, event_type AS to_type, count(*) AS n,
        |       count(DISTINCT user_id) AS n_users
        |FROM s WHERE prev IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import graft.operators.EventPaths
      EventPaths.transitions(Tables(s, dir).events,
        "user_id", "ts", "event_type", "event_id")
        .orderBy(col("from_type"), col("to_type"))
    },

    // Salted two-stage rollup: the skew-mitigation aggregation must
    // equal the plain groupBy — the oracle IS the unsalted form. The
    // decimal cast keeps the two-stage double sum engine-exact.
    "q111_salted_rollup" -> QueryDef(
      """SELECT l_returnflag,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS qty_sum,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      graft.core.ScaleOps.saltedSumCount(Tables(s, dir).lineitem,
        col("l_returnflag"), col("l_quantity").cast("decimal(28,2)"),
        saltBuckets = 16)
        .select(col("_key").as("l_returnflag"),
          col("sum").cast("double").as("qty_sum"), col("n"))
        .orderBy(col("l_returnflag"))
    },

    // Salted skew join: replicate-small/salt-big must produce EXACTLY
    // the plain equi-join's rows — oracle is the plain join. The small
    // side is a filtered orders slice (the hot-dim case salting exists
    // for).
    "q112_salted_join" -> QueryDef(
      """SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, o.o_orderpriority
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderkey % 500 = 0
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val hotDim = t.orders.filter(col("o_orderkey") % 500 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      graft.core.ScaleOps.saltedJoin(t.lineitem, hotDim,
        col("l_orderkey"), col("o_orderkey"), saltBuckets = 8)
        .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"),
          col("o_orderpriority"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // HLL++ error contract, oracle-checked: per language, the exact
    // distinct doc count and a verdict that the approx_count_distinct
    // estimate landed within 3·rsd of it. The estimate itself is
    // engine-specific so it stays OUT of the row; DuckDB asserts the
    // verdict as literal TRUE — a hash match PROVES the bound held.
    "q114_distinct_estimate" -> QueryDef(
      """SELECT lang, count(DISTINCT doc_id) AS exact_distinct,
        |       TRUE AS hll_ok
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      graft.operators.Sketches.distinctEstimateChecked(
        Tables(s, dir).documents, "lang", "doc_id", rsd = 0.05)
        .orderBy(col("lang"))
    },

    // Count-min error contract over the exact top-20 tokens: estimates
    // never under-count and over-count ≤ eps·N. Same witness pattern as
    // q114 — the oracle recomputes the exact top-k and asserts TRUE.
    "q115_cms_bounds" -> QueryDef(
      """WITH toks AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |                t -> t != '')) AS tok FROM documents),
        |c AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok)
        |SELECT tok, n AS exact_n, TRUE AS cms_ok FROM c
        |ORDER BY n DESC, tok ASC LIMIT 20""".stripMargin) { (s, dir) =>
      graft.operators.Sketches.cmsCheckedTopTokens(
        Tables(s, dir).documents, k = 20, eps = 0.001)
    },

    // Data-skipping accounting for the q93 layout family: what does
    // Z-ORDER clustering buy a zone-map reader on a 2-D box predicate,
    // vs linear clustering on one dim — equal-width key-space buckets
    // as file-group stand-ins (equal-count would need the fleet-banned
    // SinglePartition global sort), per-bucket min/max intersection,
    // rows-scanned-if-pruned vs exact matches. The inequality the
    // layout exists for (zorder touches fewer rows when the box is
    // selective on BOTH dims) is pinned in ScaleOpsSpec; the oracle
    // recomputes every count including the Morton interleave.
    "q215_zorder_skipping" -> QueryDef(
      """WITH base AS (SELECT
        |    CAST(concat('0x', substr(md5('za:' || CAST(l_orderkey AS VARCHAR)
        |      || ':' || CAST(l_linenumber AS VARCHAR)), 1, 15)) AS BIGINT)
        |      % 1024 AS a,
        |    CAST(concat('0x', substr(md5('zb:' || CAST(l_orderkey AS VARCHAR)
        |      || ':' || CAST(l_linenumber AS VARCHAR)), 1, 15)) AS BIGINT)
        |      % 1024 AS b FROM lineitem),
        |zd AS (SELECT a, b,
        |    CAST(list_sum(list_transform(range(10), i ->
        |      ((a >> CAST(i AS INT)) & 1) * (CAST(1 AS BIGINT) << CAST(2*i AS INT))
        |      + ((b >> CAST(i AS INT)) & 1) * (CAST(1 AS BIGINT) << CAST(2*i+1 AS INT))
        |    )) AS BIGINT) AS z,
        |    CASE WHEN a BETWEEN 200 AND 400 AND b BETWEEN 100 AND 300
        |      THEN 1 ELSE 0 END AS hit
        |  FROM base),
        |lm AS (SELECT max(a) AS kmax FROM zd),
        |lper AS (SELECT a * 256 // (lm.kmax + 1) AS bucket,
        |    min(a) AS mina, max(a) AS maxa, min(b) AS minb, max(b) AS maxb,
        |    count(*) AS cnt, sum(hit) AS matches
        |  FROM zd, lm GROUP BY 1),
        |zm AS (SELECT max(z) AS kmax FROM zd),
        |zper AS (SELECT z * 256 // (zm.kmax + 1) AS bucket,
        |    min(a) AS mina, max(a) AS maxa, min(b) AS minb, max(b) AS maxb,
        |    count(*) AS cnt, sum(hit) AS matches
        |  FROM zd, zm GROUP BY 1),
        |lsum AS (SELECT 'linear_a' AS layout,
        |    CAST(count(*) AS BIGINT) AS buckets_used,
        |    CAST(sum(CASE WHEN NOT (maxa < 200 OR mina > 400 OR maxb < 100
        |      OR minb > 300) THEN 1 ELSE 0 END) AS BIGINT) AS buckets_hit,
        |    CAST(sum(cnt) AS BIGINT) AS rows_total,
        |    CAST(sum(CASE WHEN NOT (maxa < 200 OR mina > 400 OR maxb < 100
        |      OR minb > 300) THEN cnt ELSE 0 END) AS BIGINT) AS rows_in_hit,
        |    CAST(sum(matches) AS BIGINT) AS rows_match FROM lper),
        |zsum AS (SELECT 'zorder_ab' AS layout,
        |    CAST(count(*) AS BIGINT) AS buckets_used,
        |    CAST(sum(CASE WHEN NOT (maxa < 200 OR mina > 400 OR maxb < 100
        |      OR minb > 300) THEN 1 ELSE 0 END) AS BIGINT) AS buckets_hit,
        |    CAST(sum(cnt) AS BIGINT) AS rows_total,
        |    CAST(sum(CASE WHEN NOT (maxa < 200 OR mina > 400 OR maxb < 100
        |      OR minb > 300) THEN cnt ELSE 0 END) AS BIGINT) AS rows_in_hit,
        |    CAST(sum(matches) AS BIGINT) AS rows_match FROM zper)
        |SELECT * FROM lsum UNION ALL SELECT * FROM zsum
        |ORDER BY layout""".stripMargin) { (s, dir) =>
      val li = Tables(s, dir).lineitem
      def spread(tag: String) =
        pmod(conv(substring(md5(concat(lit(tag + ":"),
          col("l_orderkey").cast("string"), lit(":"),
          col("l_linenumber").cast("string")).cast("binary")), 1, 15),
          16, 10).cast("long"), lit(1024L))
      graft.operators.Layout.skippingReport(
        li.select(spread("za").as("pa"), spread("zb").as("pb")),
        col("pa"), col("pb"), bits = 10, buckets = 256,
        aLo = 200L, aHi = 400L, bLo = 100L, bHi = 300L)
        .orderBy(col("layout"))
    },

    // Gonzalez k-center farthest-point coreset: 8 maximally-spread
    // exemplars of the embedding corpus + the k-center objective
    // (radius) — diversity selection for curriculum seeding and eval
    // panels; the corpus-level companion of q165's per-query MMR. All
    // rounds integer-exact on the 1024 quantization grid; the oracle
    // re-runs the full selection as a chained MATERIALIZED CTE and the
    // selections hash-compare.
    "q213_kcenter_coreset" -> QueryDef(kCenterSql(8)) { (s, dir) =>
      graft.operators.Coreset.kCenter(Tables(s, dir).embeddings, k = 8)
        .select(col("rank").as("sel_rank"), col("vec_id"),
          col("sel_dist"), col("radius"))
        .orderBy(col("sel_rank"))
    },

    // Count-min join-cardinality estimation (the CM inner-product
    // estimator): |orders ⋈ lineitem on orderkey| estimated from two
    // 4×1024 sketches built in one pass each — the join-PLANNING
    // primitive that sizes a join from kilobytes before running it.
    // The md5-seeded sketch is deterministic, so the oracle rebuilds it
    // and the ESTIMATES hash-compare (not just verdicts); exact join
    // size attached, with the never-undercount guarantee as a column.
    "q212_cms_join_estimate" -> QueryDef(
      """WITH lk AS (SELECT o_orderkey AS k FROM orders),
        |rk AS (SELECT l_orderkey AS k FROM lineitem),
        |skl AS (SELECT t.i AS hrow,
        |          CAST(concat('0x', substr(md5('cmsj' || CAST(t.i AS VARCHAR)
        |            || ':' || CAST(k AS VARCHAR)), 1, 15)) AS BIGINT) % 1024
        |            AS bucket,
        |          CAST(count(*) AS BIGINT) AS cnt
        |        FROM lk CROSS JOIN range(4) t(i) GROUP BY 1, 2),
        |skr AS (SELECT t.i AS hrow,
        |          CAST(concat('0x', substr(md5('cmsj' || CAST(t.i AS VARCHAR)
        |            || ':' || CAST(k AS VARCHAR)), 1, 15)) AS BIGINT) % 1024
        |            AS bucket,
        |          CAST(count(*) AS BIGINT) AS cnt
        |        FROM rk CROSS JOIN range(4) t(i) GROUP BY 1, 2),
        |est0 AS (SELECT skl.hrow,
        |          CAST(sum(CAST(skl.cnt AS HUGEINT) * skr.cnt) AS BIGINT)
        |            AS est_n
        |        FROM skl JOIN skr USING (hrow, bucket) GROUP BY skl.hrow),
        |est AS (SELECT t.i AS hrow, coalesce(est0.est_n, 0) AS est_n
        |        FROM range(4) t(i) LEFT JOIN est0 ON est0.hrow = t.i),
        |ex AS (SELECT CAST(coalesce(sum(CAST(a.n AS HUGEINT) * b.n), 0)
        |           AS BIGINT) AS exact_n
        |       FROM (SELECT k, count(*) AS n FROM lk GROUP BY k) a
        |       JOIN (SELECT k, count(*) AS n FROM rk GROUP BY k) b USING (k))
        |SELECT est.hrow, est.est_n, ex.exact_n,
        |       (est.est_n >= ex.exact_n) AS ge_exact
        |FROM est CROSS JOIN ex ORDER BY est.hrow""".stripMargin) { (s, dir) =>
      graft.operators.Sketches.cmsJoinCardinality(
        Tables(s, dir).orders, "o_orderkey",
        Tables(s, dir).lineitem, "l_orderkey",
        depth = 4, width = 1024)
        .orderBy(col("hrow"))
    },

    // The SKETCH-ONLY join estimator — q212's production path split
    // out (the q175→q178 theta precedent): |customer ⋈ orders on
    // custkey| estimated purely from two 4×512 cell frames; the exact
    // join size appears NOWHERE in this plan (that is the point — the
    // estimator exists so the join never runs). All 4 hash rows always
    // return (a bucket-disjoint row coalesces to est_n = 0 rather than
    // silently vanishing — the min-over-rows caller needs the tightest
    // row most when the join is empty). The md5-seeded sketches are
    // deterministic, so the oracle rebuilds them and the ESTIMATES
    // hash-compare. PlanAuditSpec pins the shape: the only join is a
    // broadcast of sketch-sized aggregates, no sort-merge join, no
    // exchange carrying relation rows.
    "q219_cms_sketch_only" -> QueryDef(
      """WITH lk AS (SELECT c_custkey AS k FROM customer),
        |rk AS (SELECT o_custkey AS k FROM orders),
        |skl AS (SELECT t.i AS hrow,
        |          CAST(concat('0x', substr(md5('cmsj' || CAST(t.i AS VARCHAR)
        |            || ':' || CAST(k AS VARCHAR)), 1, 15)) AS BIGINT) % 512
        |            AS bucket,
        |          CAST(count(*) AS BIGINT) AS cnt
        |        FROM lk CROSS JOIN range(4) t(i) GROUP BY 1, 2),
        |skr AS (SELECT t.i AS hrow,
        |          CAST(concat('0x', substr(md5('cmsj' || CAST(t.i AS VARCHAR)
        |            || ':' || CAST(k AS VARCHAR)), 1, 15)) AS BIGINT) % 512
        |            AS bucket,
        |          CAST(count(*) AS BIGINT) AS cnt
        |        FROM rk CROSS JOIN range(4) t(i) GROUP BY 1, 2),
        |est0 AS (SELECT skl.hrow,
        |          CAST(sum(CAST(skl.cnt AS HUGEINT) * skr.cnt) AS BIGINT)
        |            AS est_n
        |        FROM skl JOIN skr USING (hrow, bucket) GROUP BY skl.hrow)
        |SELECT t.i AS hrow, coalesce(est0.est_n, 0) AS est_n
        |FROM range(4) t(i) LEFT JOIN est0 ON est0.hrow = t.i
        |ORDER BY hrow""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      graft.operators.Sketches.cmsJoinEstimate(
        graft.operators.Sketches.cmsKeySketch(t.customer, "c_custkey",
          depth = 4, width = 512),
        graft.operators.Sketches.cmsKeySketch(t.orders, "o_custkey",
          depth = 4, width = 512),
        depth = 4)
        .orderBy(col("hrow"))
    },

    // Mergeable-HLL contract: per source, the estimate from uniting
    // per-(source, lang) sketches must land within 3 sigma of exact —
    // the property incremental distinct counting stands on — and so
    // must the one-shot sketch. (Exact whole==merged equality is NOT
    // the contract: a union drops the HIP estimator once sketches go
    // dense, a divergence first observed at sf1.0 — see
    // Sketches.hllMergeContract.) Oracle: exact distinct + both
    // verdicts literal TRUE.
    "q117_hll_merge" -> QueryDef(
      """SELECT source, count(DISTINCT doc_id) AS exact_distinct,
        |       TRUE AS merge_ok, TRUE AS hll_ok
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      graft.operators.Sketches.hllMergeContract(
        Tables(s, dir).documents, "source", "lang", "doc_id")
        .orderBy(col("source"))
    },

    // Space-saving heavy hitters per language in the provably-exact
    // regime — the oracle recomputes the ranked top-10 token counts
    // exactly and asserts err = 0 (no eviction ever happened). The
    // capacity is DERIVED from the data (2x the max per-lang distinct
    // count, floored at 4096), because ScaleUp's per-replica salting
    // grows the vocabulary with scale factor: a fixed 4096 would
    // silently leave the exact regime around sf30 and fail the oracle
    // at exactly the scale the witness is meant to cover. The approx
    // regime (tiny capacity, evictions, per-item error bounds) is
    // SpaceSavingSpec's domain.
    "q131_heavy_hitters" -> QueryDef(
      """WITH toks AS (
        |  SELECT lang, unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |                t -> t != '')) AS item FROM documents),
        |c AS (SELECT lang, item, count(*) AS n FROM toks GROUP BY lang, item),
        |r AS (SELECT lang, item, n,
        |        ROW_NUMBER() OVER (PARTITION BY lang
        |          ORDER BY n DESC, item ASC) AS rank FROM c)
        |SELECT lang, item, CAST(n AS BIGINT) AS est,
        |       CAST(0 AS BIGINT) AS err, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 10 ORDER BY lang, rank""".stripMargin) { (s, dir) =>
      val items = Tables(s, dir).documents
        .select(col("lang"),
          explode(graft.functions.TextFunctions.tokens(col("text"))).as("item"))
      // The capacity derivation is an EXTRA corpus-sized aggregation at
      // query-build time (the generator publishes no vocabulary-vs-sf
      // formula to derive it constant-time from), so its cost is logged
      // per run: bench readers discount it from q131's number, which
      // otherwise silently includes a scan the sketch exists to avoid.
      val t0 = System.nanoTime()
      val maxDistinct = items.groupBy(col("lang"))
        .agg(countDistinct(col("item")).as("d"))
        .orderBy(col("d").desc).limit(1).select(col("d"))
        .collect().headOption.map(_.getLong(0)).getOrElse(0L)
      Console.err.println(
        f"[q131] capacity-derivation scan (countDistinct per lang): " +
          f"${(System.nanoTime() - t0) / 1e9}%.3f s — included in q131 timings")
      val capacity = math.max(4096L, 2L * maxDistinct).min(Int.MaxValue).toInt
      graft.operators.Sketches.heavyHittersTopK(
        items, groupCol = "lang", itemCol = "item",
        capacity = capacity, k = 10)
        .orderBy(col("lang"), col("rank"))
    },

    // Robust outliers: per event type, events whose value sits more than
    // 3 robust sigmas (median/MAD) from the type median — the detector
    // that survives the anomalies it hunts (mean/stddev move with the
    // outlier; median and MAD don't). The float median/MAD stay internal;
    // emitted value is the raw input double (bit-identical in both
    // engines), so the row set is engine-exact.
    "q118_robust_outliers" -> QueryDef(
      """WITH m AS (SELECT event_type, median(value) AS med
        |           FROM events GROUP BY event_type),
        |a AS (SELECT e.event_type, e.event_id, e.value,
        |             abs(e.value - m.med) AS dev
        |      FROM events e JOIN m USING(event_type)),
        |md AS (SELECT event_type, median(dev) AS mad FROM a GROUP BY event_type)
        |SELECT a.event_type, a.event_id, a.value FROM a JOIN md USING(event_type)
        |WHERE a.dev > 3 * 1.4826 * md.mad
        |ORDER BY a.event_type, a.event_id""".stripMargin) { (s, dir) =>
      graft.operators.CorpusOps.robustOutliers(
        Tables(s, dir).events.select(col("event_type"), col("event_id"), col("value")),
        groupCol = "event_type", valueCol = "value", z = 3.0)
        .select(col("event_type"), col("event_id"), col("value"))
        .orderBy(col("event_type"), col("event_id"))
    },

    // Key-skew diagnostic: top keys by row count with exact permille
    // share — the pre-join report that decides whether a key needs
    // salting. Counts are map-side combinable; the top slice comes
    // from TakeOrdered, never a global window over the key set.
    "q98_key_skew" -> QueryDef(
      """WITH c AS (SELECT user_id AS key, count(*) AS n FROM events GROUP BY 1),
        |t AS (SELECT sum(n) AS total FROM c),
        |r AS (SELECT key, n,
        |        ROW_NUMBER() OVER (ORDER BY n DESC, key) AS rank FROM c)
        |SELECT rank, key, n, CAST(n * 1000 // total AS BIGINT) AS permille
        |FROM r, t WHERE rank <= 10 ORDER BY rank""".stripMargin) { (s, dir) =>
      graft.core.ScaleOps.keySkew(Tables(s, dir).events, col("user_id"), 10)
        .orderBy(col("rank"))
    },

    // Weekly cohort retention triangle: cohort = week of first
    // activity; n_users = distinct cohort members active k weeks
    // later. The event stream collapses FIRST to distinct
    // (user, week) — map-side combinable, bounded by users × weeks —
    // and everything else runs on that collapsed table.
    "q97_cohort_retention" -> QueryDef(
      """WITH weeks AS (SELECT DISTINCT user_id AS u, date_trunc('week', ts) AS w
        |               FROM events),
        |first AS (SELECT u, min(w) AS cohort FROM weeks GROUP BY 1)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
        |       CAST(date_diff('day', cohort, w) // 7 AS INT) AS k,
        |       count(*) AS n_users
        |FROM weeks JOIN first USING (u)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import graft.operators.Cohorts
      Cohorts.retention(Tables(s, dir).events, "user_id", "ts")
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
          col("k"), col("n_users"))
        .orderBy(col("cohort_week"), col("k"))
    },

    // Vocabulary statistics: top-20 tokens per language by frequency.
    // The corpus explodes to (lang, token) and aggregates with map-side
    // combine; the top-k window runs over the AGGREGATED vocab table
    // (small), never the raw token stream, so the lang-skewed window is
    // cheap by construction.
    "q59_token_topk" -> QueryDef(
      """WITH toks AS (
        |  SELECT lang, unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |                      t -> t != '')) AS tok
        |  FROM documents),
        |counts AS (
        |  SELECT lang, tok, count(*) AS n FROM toks GROUP BY lang, tok),
        |ranked AS (
        |  SELECT lang, tok, n,
        |         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, tok ASC) AS rnk
        |  FROM counts)
        |SELECT lang, tok, n, rnk FROM ranked WHERE rnk <= 20
        |ORDER BY lang, rnk""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions
      val counts = Tables(s, dir).documents
        .select(col("lang"), explode(TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("n").desc, col("tok").asc)
      counts.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 20)
        .orderBy(col("lang"), col("rnk"))
    },

    // Gap-based sessionization: new session per key at the first event
    // or after a >30 min silence; session counter is a running sum over
    // the boundary indicator.
    "q56_sessionize" -> QueryDef(
      """WITH ev AS (
        |  SELECT event_id, user_id % 100 AS k, ts FROM events),
        |g AS (
        |  SELECT event_id, k, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |              OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000 THEN 1
        |              ELSE 0 END AS new_session
        |  FROM ev WINDOW w AS (PARTITION BY k ORDER BY ts, event_id)),
        |s AS (
        |  SELECT event_id, k,
        |         CAST(SUM(new_session) OVER (PARTITION BY k ORDER BY ts, event_id
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM g)
        |SELECT event_id, k, session_seq,
        |       k || '#' || session_seq AS session_id
        |FROM s ORDER BY event_id LIMIT 5000""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir).events
        .select(col("event_id"), (col("user_id") % 100).as("k"), col("ts"))
      Sessionize.byGap(ev, keyCol = "k", tsCol = "ts", seqCol = "event_id",
        gapSeconds = 1800)
        .select(col("event_id"), col("k"), col("session_seq"), col("session_id"))
        .orderBy(col("event_id"))
        .limit(5000)
    },

    // Spark's NATIVE session_window aggregation over the same event
    // stream — merges events whose ts falls strictly inside the open
    // session end (last ts + gap), i.e. a gap of EXACTLY 30 min starts a
    // new session (half-open [start, end)), unlike q56's >-rule. The
    // oracle re-derives that boundary with >= on millisecond deltas.
    "q58_session_window" -> QueryDef(
      """WITH ev AS (
        |  SELECT event_id, user_id % 100 AS k, ts FROM events),
        |g AS (
        |  SELECT event_id, k, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |              OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >= 1800000 THEN 1
        |              ELSE 0 END AS new_session
        |  FROM ev WINDOW w AS (PARTITION BY k ORDER BY ts, event_id)),
        |s AS (
        |  SELECT k, ts,
        |         SUM(new_session) OVER (PARTITION BY k ORDER BY ts, event_id
        |              ROWS UNBOUNDED PRECEDING) AS seq
        |  FROM g)
        |SELECT k, CAST(epoch_ms(min(ts)) AS BIGINT) AS start_ms,
        |       CAST(epoch_ms(max(ts)) + 1800000 AS BIGINT) AS end_ms,
        |       count(*) AS n_events
        |FROM s GROUP BY k, seq ORDER BY k, start_ms""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir).events
        .select((col("user_id") % 100).as("k"), col("ts").cast("timestamp").as("ts"))
      ev.groupBy(col("k"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("k"),
          unix_millis(col("w.start")).as("start_ms"),
          unix_millis(col("w.end")).as("end_ms"),
          col("n_events"))
        .orderBy(col("k"), col("start_ms"))
    },

    // Bucketed point-in-interval join: click events matched to the
    // 30-minute windows opened by view events of the same key. The
    // oracle is DuckDB's native inequality join.
    "q57_range_join" -> QueryDef(
      """WITH pts AS (
        |  SELECT event_id, user_id % 50 AS k, ts FROM events
        |  WHERE event_type = 'click'),
        |iv AS (
        |  SELECT user_id % 50 AS k, ts AS s, ts + to_seconds(1800) AS e,
        |         min(event_id) AS iv_id
        |  FROM events WHERE event_type = 'view'
        |  GROUP BY 1, 2, 3)
        |SELECT p.event_id, p.k, i.iv_id
        |FROM pts p JOIN iv i
        |  ON p.k = i.k AND p.ts >= i.s AND p.ts <= i.e
        |ORDER BY p.event_id, i.iv_id LIMIT 5000""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir).events
      val pts = ev.filter(col("event_type") === "click")
        .select(col("event_id"), (col("user_id") % 50).as("k"), col("ts"))
      val iv = ev.filter(col("event_type") === "view")
        .groupBy((col("user_id") % 50).as("k"), col("ts").as("s"),
          (col("ts") + expr("INTERVAL 1800 SECONDS")).as("e"))
        .agg(min(col("event_id")).as("iv_id"))
      RangeJoin.pointInInterval(pts, iv, keyCol = "k", ptCol = "ts",
        startCol = "s", endCol = "e", bucketSeconds = 1800)
        .select(col("event_id"), col("k"), col("iv_id"))
        .orderBy(col("event_id"), col("iv_id"))
        .limit(5000)
    }
  )
}
