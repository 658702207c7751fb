package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention over an event stream: cohort = the week of a user's
  * FIRST activity; the retention triangle counts, for each (cohort,
  * offset k), the distinct cohort members active in week cohort + k —
  * the standard companion to [[Funnel]] for product analytics, and the
  * per-source freshness diagnostic for a training corpus (sources whose
  * contributor cohorts stop returning are going stale).
  *
  * Shape at scale: the raw event stream collapses FIRST to distinct
  * (user, week) — one shuffle, map-side combinable, output bounded by
  * users × weeks regardless of event volume. Everything after runs on
  * that collapsed table: a per-user min (same key, reusable exchange)
  * and one small aggregation. No window over raw events.
  */
object Cohorts {

  /** Distinct (user, activity week) pairs — weeks are Monday-truncated
    * timestamps via date_trunc, matching DuckDB's convention. */
  def activityWeeks(events: DataFrame, userCol: String, tsCol: String): DataFrame =
    events.select(col(userCol).as("u"),
      date_trunc("week", col(tsCol)).as("w")).distinct()

  /** The retention triangle: (cohort_week, k, n_users), k in weeks.
    * Week differences are exact multiples of 7 days, so the /7 is
    * integer-exact in double arithmetic on both engines. */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val weeks = activityWeeks(events, userCol, tsCol)
    val first = weeks.groupBy(col("u")).agg(min(col("w")).as("cohort"))
    weeks.join(first, Seq("u"))
      .groupBy(col("cohort"),
        (datediff(col("w"), col("cohort")) / 7).cast("int").as("k"))
      .agg(count(lit(1)).as("n_users"))
  }
}
