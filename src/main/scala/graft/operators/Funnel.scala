package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: for each user, the
  * earliest timestamp of step 1, then for each later step the earliest
  * matching event STRICTLY after that user's previous-step time — the
  * classic view → click → purchase conversion measurement (an analytics
  * extension over the reference's event tables, same family as
  * [[Sessionize]] / [[AsofJoin]]).
  *
  * Shape at scale: k steps = k chained aggregations + joins, every one
  * keyed on the user column — the SAME shuffle key throughout, so a
  * pre-partitioned (bucketed) event table pays one exchange total, and
  * the per-step tables shrink monotonically (each is a subset of the
  * previous step's users), letting AQE broadcast the accumulator side of
  * every join after the first. No window over the raw event stream, no
  * per-user event materialization: each step touches only its own
  * filtered slice of events.
  */
object Funnel {

  /** One row per user that completed step 1: `<step>_ts` columns
    * (null once the user falls out of the funnel) and `steps_reached`.
    * `steps` maps output-column prefix → event predicate, in funnel
    * order. Strict ordering: a step-k event at exactly the step-(k-1)
    * timestamp does NOT count (same-instant events are one action).
    * `windowMillis` bounds the whole conversion: every later step must
    * land within that many millis of the user's step-1 time
    * (inclusive) — the "converted within 7 days" form. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      steps: Seq[(String, Column)],
      windowMillis: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.map(_._1).distinct.size == steps.size,
      "step names must be unique")
    val (n1, p1) = steps.head
    val first = s"${n1}_ts"
    var acc = events.filter(p1).groupBy(col(userCol))
      .agg(min(col(tsCol)).as(first))
    var prev = first
    steps.tail.foreach { case (nm, p) =>
      val inWindow = windowMillis match {
        case Some(w) => unix_millis(col(tsCol).cast("timestamp")) -
          unix_millis(col(first).cast("timestamp")) <= w
        case None => lit(true)
      }
      val carry = if (prev == first) Seq(col(userCol), col(prev))
        else Seq(col(userCol), col(prev), col(first))
      // project the event side down to (user, ts) BEFORE the join: the
      // step columns carried from `acc` must never collide with event
      // columns, and the scan is pruned to the two needed columns
      val nxt = events.filter(p).select(col(userCol), col(tsCol))
        .join(acc.select(carry: _*), Seq(userCol))
        .filter(col(tsCol) > col(prev) && inWindow)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"${nm}_ts"))
      acc = acc.join(nxt, Seq(userCol), "left")
      prev = s"${nm}_ts"
    }
    val reached = steps.map { case (nm, _) =>
      when(col(s"${nm}_ts").isNotNull, 1).otherwise(0)
    }.reduce(_ + _)
    acc.withColumn("steps_reached", reached)
  }

  /** The funnel summary: users reaching each step (the conversion
    * curve), derived from [[funnel]] output — one tiny aggregation. */
  def conversionCurve(perUser: DataFrame, steps: Seq[String]): DataFrame = {
    val aggs = steps.zipWithIndex.map { case (nm, i) =>
      sum(when(col("steps_reached") >= i + 1, 1L).otherwise(0L)).as(s"${nm}_users")
    }
    perUser.agg(aggs.head, aggs.tail: _*)
  }
}
