package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.rules.RuleCompiler

/** The configuration table + feature flags as control-plane operators
  * (reference: src/database_schema.cpp:95-103 `configuration` table
  * (key, value, category, created_at, updated_at);
  * include/config_manager.hpp typed getters; include/feature_flags.hpp +
  * src/feature_flags.cpp rollout).
  *
  * Typed-getter parse rules replicated from src/config_manager.cpp:
  *   - getInt: std::stoi — optional whitespace/sign + digit prefix;
  *     parse failure → default (:46-57).
  *   - getBool: lowercase value ∈ {true, 1, yes, on}; a PRESENT key with
  *     any other value is false, not the default (:59-66).
  *   - getDouble: std::stod numeric prefix; failure → default (:68-80).
  *   - getString: raw value, absent → default.
  *
  * Rollout (src/feature_flags.cpp:60-80): pct ≥ 100 → on, ≤ 0 → off,
  * else FNV-1a64(userId) % 10000 buckets of 0.01 %, enabled iff
  * bucket/100 < pct. The hash kernel is [[graft.functions.HashExpressions.fnv1a64]].
  *
  * Scale: configuration and flags are tiny control-plane tables — every
  * join against them below broadcasts; the typed projections are narrow
  * row-wise Columns.
  */
object ConfigFlags {

  private val StoiRe = "^[ \\t\\n\\r\\f\\u000B]*([+-]?\\d+)"

  /** std::stoi semantics as a Column: integer prefix or default. */
  def getInt(value: Column, default: Int): Column =
    coalesce(nullif(regexp_extract(value, StoiRe, 1), lit("")).cast("int"),
      lit(default))

  /** getBool: present value ∈ {true, 1, yes, on} (case-insensitive). */
  def getBool(value: Column): Column =
    lower(value).isin("true", "1", "yes", "on")

  /** std::stod prefix semantics (shared with the rule compiler). */
  def getDouble(value: Column, default: Double): Column =
    coalesce(RuleCompiler.stodPrefix(value), lit(default))

  /** Point lookup with default — the reference's getString(key, default)
    * over the configuration dataset (broadcast-sized). */
  def lookup(config: DataFrame, key: String, default: String): String = {
    val rows = config.filter(col("key") === key).select(col("value")).head(1)
    rows.headOption.map(_.getString(0)).getOrElse(default)
  }

  /** Upsert a key (the dynamic-config write path): replaces the row,
    * stamping updated_at and preserving created_at for existing keys. */
  def upsert(config: DataFrame, key: String, value: String, category: String,
      now: java.sql.Timestamp): DataFrame = {
    val spark = config.sparkSession
    import spark.implicits._
    val existing = config.filter(col("key") === key)
      .select(col("created_at")).head(1).headOption
      .map(_.getAs[java.sql.Timestamp](0))
    val row = Seq((key, value, category, existing.getOrElse(now), now))
      .toDF("key", "value", "category", "created_at", "updated_at")
    config.filter(col("key") =!= key).unionByName(row)
  }

  /** Category scan (reference groups config keys by section). */
  def byCategory(config: DataFrame, category: String): DataFrame =
    config.filter(col("category") === category)

  /** Rollout bucket in [0, 100): FNV-1a64(userId) % 10000 / 100, with the
    * mod taken UNSIGNED like the reference's uint64_t. The hash surfaces
    * as a signed long, so negative values are congruence-shifted by
    * 2^64 mod 10000 = 1616 before the final pmod. */
  def rolloutBucket(userId: Column): Column = {
    val h = graft.functions.HashExpressions.fnv1a64(userId)
    val unsignedMod = pmod(
      pmod(h, lit(10000L)) + when(h < 0, lit(1616L)).otherwise(lit(0L)),
      lit(10000L))
    unsignedMod.cast("double") / 100.0
  }

  /** shouldEnableForUser as a Column over (rollout_pct, user_id). */
  def enabledForUser(rolloutPct: Column, userId: Column): Column =
    when(rolloutPct >= 100.0, lit(true))
      .when(rolloutPct <= 0.0, lit(false))
      .otherwise(rolloutBucket(userId) < rolloutPct)
}
