package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional extra args: run only these query names (local debugging;
    // the driver always passes exactly two args → full run)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.GraftSession.builder("graft-verify", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Failures are recorded in the output artifact, not just stderr: a
    // query that throws here produces NO result dir, and a downstream
    // compare that merely iterates result dirs would silently drop the
    // row (round 9 lost q63 exactly this way — an AnalysisException left
    // 125 of 126 entries and nothing red). _failures.json makes the gap
    // impossible to miss, and oracle_check.py independently fails any
    // oracle entry with no result dir.
    val failures = scala.collection.mutable.ListBuffer.empty[(String, String)]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures += name -> String.valueOf(e.getMessage)
      }
      // deterministic release of per-query persisted frames
      spark.sharedState.cacheManager.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Resolve run-scoped fixture placeholders (q102/q124's IVF index root
    // is a per-(appId, sf) temp dir): the queries above already built the
    // fixture for THIS sfDir, so the substituted path is the index the
    // oracle must read.
    val ivfPath = graft.queries.ExtensionQueries.ivfFixturePath(spark, sfDir)
    val deflatePath = graft.queries.CorpusQueries.deflateFixturePath(spark, sfDir)
    val bpePath = graft.queries.LmQueries.bpeFixturePath(spark, sfDir)
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        k -> v.replace(graft.queries.ExtensionQueries.IvfFixtureToken, ivfPath)
          .replace(graft.queries.CorpusQueries.DeflateFixtureToken, deflatePath)
          .replace(graft.queries.LmQueries.BpeFixtureToken, bpePath)
      }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val failJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_failures.json"), failJson)
    if (failures.nonEmpty)
      System.err.println(
        s"[verify] ${failures.size} QUERY FAILURE(S): " +
          failures.map(_._1).mkString(", "))
    spark.stop()
  }
}
