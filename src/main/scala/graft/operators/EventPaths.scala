package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-path analytics: the transition matrix over consecutive events
  * per user — which step follows which, how often, and for how many
  * distinct users. The edge weights behind a sankey/Markov view of user
  * behavior, completing the [[Funnel]] / [[Cohorts]] family.
  *
  * Shape at scale: one shuffle on the user key for the lag window (the
  * per-user partition is bounded by that user's event count — the
  * [[Sessionize]] contract), then a map-side-combinable count over the
  * tiny (from, to) key space. The distinct-user count shuffles
  * (from, to, user) triples — still bounded by transitions, never wider
  * than the input.
  */
object EventPaths {

  /** (from_type, to_type, n, n_users) for every consecutive pair.
    * `seqCol` breaks timestamp ties for a total per-user order. */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, seqCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(seqCol))
    events
      .select(col(userCol).as("u"), col(typeCol).as("to_type"),
        lag(col(typeCol), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("u")).as("n_users"))
  }
}
