package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConfigFlags

/** Config-table point ops (lookup/upsert/byCategory) and rollout edge
  * semantics the oracled queries (q49/q50) don't pin. */
class ConfigFlagsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("config-spec", "4").getOrCreate()
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def cfg = Seq(
    ("etl.batch_size", "500", "etl", ts("2025-01-01 00:00:00"), ts("2025-01-01 00:00:00")),
    ("etl.enabled", "on", "etl", ts("2025-01-01 00:00:00"), ts("2025-01-01 00:00:00")),
    ("ws.port", "8081", "ws", ts("2025-01-01 00:00:00"), ts("2025-01-01 00:00:00")))
    .toDF("key", "value", "category", "created_at", "updated_at")

  test("lookup returns value or default; byCategory filters") {
    assert(ConfigFlags.lookup(cfg, "etl.batch_size", "0") == "500")
    assert(ConfigFlags.lookup(cfg, "missing.key", "fallback") == "fallback")
    assert(ConfigFlags.byCategory(cfg, "etl").count() == 2)
    // empty config table → default, no crash
    assert(ConfigFlags.lookup(cfg.limit(0), "any", "d") == "d")
  }

  test("upsert replaces value, keeps created_at, stamps updated_at") {
    val now = ts("2025-06-01 12:00:00")
    val updated = ConfigFlags.upsert(cfg, "etl.batch_size", "1000", "etl", now)
    assert(updated.count() == 3)
    val row = updated.filter(col("key") === "etl.batch_size").head
    assert(row.getAs[String]("value") == "1000")
    assert(row.getAs[java.sql.Timestamp]("created_at") == ts("2025-01-01 00:00:00"))
    assert(row.getAs[java.sql.Timestamp]("updated_at") == now)
    // new key: created_at = updated_at = now
    val added = ConfigFlags.upsert(cfg, "new.key", "x", "misc", now)
    assert(added.count() == 4)
    assert(added.filter(col("key") === "new.key").head
      .getAs[java.sql.Timestamp]("created_at") == now)
  }

  test("rollout: deterministic per user, monotone in pct, exact at edges") {
    val users = (1 to 200).map(i => s"user$i").toDF("u")
    val dec = users.select(
      ConfigFlags.enabledForUser(lit(0.0), col("u")).as("off"),
      ConfigFlags.enabledForUser(lit(100.0), col("u")).as("on"),
      ConfigFlags.enabledForUser(lit(30.0), col("u")).as("p30"),
      ConfigFlags.enabledForUser(lit(60.0), col("u")).as("p60")).collect()
    assert(dec.forall(!_.getBoolean(0)))          // pct<=0 always off
    assert(dec.forall(_.getBoolean(1)))           // pct>=100 always on
    // monotone: anyone in at 30% is in at 60%
    assert(dec.forall(r => !r.getBoolean(2) || r.getBoolean(3)))
    val share30 = dec.count(_.getBoolean(2)).toDouble / dec.length
    assert(share30 > 0.15 && share30 < 0.45)      // ~30% of users
    // stable: same user hashes to the same bucket every time
    val b1 = users.select(ConfigFlags.rolloutBucket(col("u")).as("b")).collect()
    val b2 = users.select(ConfigFlags.rolloutBucket(col("u")).as("b")).collect()
    assert(b1.map(_.getDouble(0)).toSeq == b2.map(_.getDouble(0)).toSeq)
    assert(b1.forall(r => r.getDouble(0) >= 0.0 && r.getDouble(0) < 100.0))
  }
}
