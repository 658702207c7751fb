package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the impressions↔clicks attribution
  * shape: each right event joins the left events with the same key
  * whose event time lies in [l_ts, l_ts + window]. Both sides carry
  * watermarks AND the join condition bounds event time in both
  * directions, which is what lets Spark's symmetric stream-stream hash
  * join EVICT state: a buffered left row is dropped once the watermark
  * passes l_ts + window (no future right row can reach back to it), a
  * right row once the watermark passes its own r_ts — without the time
  * bound the join is still legal but the state grows without bound,
  * which at 100 TB/day of events is an OOM with a delay fuse. State is
  * therefore O(events inside the watermark horizon), not O(stream).
  *
  * Spark pins the GLOBAL watermark to the min across both inputs
  * (`spark.sql.streaming.multipleWatermarkPolicy` default), so
  * eviction advances only as fast as the SLOWER side — the spec pins
  * this by advancing both sides before asserting a drop.
  *
  * Inner-join semantics in Append mode: a matched pair emits in the
  * micro-batch where BOTH sides are present; arrival order across
  * batches does not change the emitted set (the spec's out-of-order
  * soak), only its batch placement. Late rows (event time behind the
  * watermark) are dropped at the input and never match — streaming
  * results are batch-equal over the NON-LATE subset, the same declared
  * contract as q63's windowed aggregation.
  *
  * Column names: callers pass distinct left/right column names (the
  * attribution shape renames up front) so the output carries both keys
  * and both timestamps unambiguously. */
object StreamJoin {

  /** `right.rTs ∈ [left.lTs, left.lTs + windowSec]`, equi on
    * `leftKey === rightKey`. Watermark delay applies to both sides. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, lTs: String, rTs: String,
      windowSec: Long, watermarkDelay: String): DataFrame = {
    require(windowSec >= 0, s"windowSec=$windowSec must be >= 0")
    left.withWatermark(lTs, watermarkDelay)
      .join(right.withWatermark(rTs, watermarkDelay),
        col(leftKey) === col(rightKey) &&
          col(rTs) >= col(lTs) &&
          col(rTs) <= col(lTs) + expr(s"INTERVAL $windowSec SECONDS"),
        "inner")
  }

  /** Left-outer form — the attribution report that must also show the
    * UNMATCHED impressions: a left row with no in-window right match
    * emits (with nulls on the right) only once the watermark passes
    * l_ts + window, i.e. once no future right row could still match
    * it. Until then it is buffered, so outer results trail the
    * watermark by design — the delay is the price of never retracting
    * an emitted row (Append mode's contract). */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, lTs: String, rTs: String,
      windowSec: Long, watermarkDelay: String): DataFrame = {
    require(windowSec >= 0, s"windowSec=$windowSec must be >= 0")
    left.withWatermark(lTs, watermarkDelay)
      .join(right.withWatermark(rTs, watermarkDelay),
        col(leftKey) === col(rightKey) &&
          col(rTs) >= col(lTs) &&
          col(rTs) <= col(lTs) + expr(s"INTERVAL $windowSec SECONDS"),
        "leftOuter")
  }

  /** The batch twin over the same predicate — the spec's parity
    * oracle, and the backfill path a production pipeline runs over
    * historical parquet with identical semantics. */
  def intervalJoinBatch(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, lTs: String, rTs: String,
      windowSec: Long): DataFrame =
    left.join(right,
      col(leftKey) === col(rightKey) &&
        col(rTs) >= col(lTs) &&
        col(rTs) <= col(lTs) + expr(s"INTERVAL $windowSec SECONDS"),
      "inner")
}
