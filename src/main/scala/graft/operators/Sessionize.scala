package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization and bucketed range joins — the two remaining
  * event-time operators every training-data/event pipeline needs and
  * Spark has no first-class operator for.
  */
object Sessionize {

  /** Assign events to sessions: a new session starts at the first event
    * of a key and whenever the gap from the previous event exceeds
    * `gapSeconds`. One shuffle on the key; the boundary detection and
    * running session counter are window expressions over the sorted
    * partition (`seqCol` breaks timestamp ties for a total order).
    * Adds `session_seq` (1-based per key) and `session_id`. */
  def byGap(events: DataFrame, keyCol: String, tsCol: String, seqCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(seqCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(tsCol), 1).over(w)
    // millisecond arithmetic: exact integers (unix_timestamp would FLOOR
    // to whole seconds, silently shifting gaps that straddle a second
    // boundary — bit us at sf0.1 where sub-second components are real)
    val newSession = when(prev.isNull ||
      unix_millis(col(tsCol).cast("timestamp")) -
        unix_millis(prev.cast("timestamp")) > gapSeconds * 1000L, 1)
      .otherwise(0)
    events
      .withColumn("session_seq", sum(newSession).over(run))
      .withColumn("session_id",
        concat(col(keyCol).cast("string"), lit("#"), col("session_seq")))
  }
}

/** Interval(point-in-range) join without row amplification or a
  * broadcast-nested-loop: both sides bucket to fixed-width time buckets,
  * meet on an equi-join (intervals explode into the few buckets they
  * span), and the exact containment predicate filters the candidates.
  * A point's bucket is unique, so each qualifying (point, interval)
  * pair meets exactly once — no post-join dedup. Shuffle volume is
  * O(points + intervals · avg-span/width). */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keyCol: String, ptCol: String, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    val pb = points.withColumn("_bucket",
      floor(unix_timestamp(col(ptCol)) / bucketSeconds))
    val ib = intervals.withColumn("_bucket",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / bucketSeconds),
        floor(unix_timestamp(col(endCol)) / bucketSeconds))))
    pb.join(ib, Seq(keyCol, "_bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("_bucket")
  }
}
