package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 (Kimball SCD2): version a
  * dimension's attribute values as validity intervals
  * [valid_from, valid_to) with an open (valid_to = NULL) current row
  * per key — the warehouse-dimension half of the reference's ETL
  * domain (its job/user tables track only the LATEST state; SCD2 is
  * what a warehouse keeps when history must be queryable "as of").
  *
  * Two entry points sharing one mechanism:
  *
  *   - [[history]]: rebuild the full interval table from a change feed
  *     in one pass — the backfill path.
  *   - [[merge]]: fold a NEW batch of changes into an existing SCD2
  *     table — the incremental path: closed rows pass through
  *     untouched, each key's open row is re-derived against the
  *     batch's changes, and no-op changes (same attributes as the
  *     in-force version) are suppressed.
  *
  * The fold LAW (Scd2Spec, two split points + a three-way fold):
  * merge(history(early), late) == history(early ∪ late) whenever the
  * batch respects the time boundary (every batch change at or after
  * its key's open valid_from — enforced loudly in-plan by `strict`,
  * the when+raise_error guard pattern: out-of-order changes would
  * silently corrupt CLOSED intervals, and an engine must refuse that,
  * not absorb it).
  *
  * Scale shape: everything is one shuffle on the key; both windows
  * (change-detection lag, interval-closing lead) share that
  * partitioning, and per-key state is the key's change count — there
  * is no corpus-sized window and no driver state anywhere. At 100 TB
  * the dimension merges per key exactly like any bucketed upsert. */
object Scd2 {

  /** Change-detection projection: (key, attrs..., ts, seq) → the SCD2
    * interval table (key, attrs..., valid_from, valid_to, seq,
    * is_current). `seq` breaks ordering ties among same-timestamp
    * changes of one key (intervals may be zero-length in that case —
    * kept, deterministically, by (ts, seq) order). Consecutive
    * duplicate attribute tuples collapse into the earlier version (the
    * no-op suppression every SCD2 loader performs). */
  def history(changes: DataFrame, keyCol: String, attrCols: Seq[String],
      tsCol: String, seqCol: String): DataFrame = {
    require(attrCols.nonEmpty, "SCD2 needs at least one attribute column")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(seqCol).asc)
    val attrs = struct(attrCols.map(col): _*)
    val deduped = changes
      .withColumn("__scd_prev", lag(attrs, 1).over(w))
      .filter(col("__scd_prev").isNull || !(attrs <=> col("__scd_prev")))
      .drop("__scd_prev")
    deduped
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((Seq(col(keyCol)) ++ attrCols.map(col) ++ Seq(
        col("valid_from"), col("valid_to"), col(seqCol).as("seq"),
        col("is_current"))): _*)
  }

  /** Fold a batch of changes into an existing SCD2 table. Closed rows
    * pass through untouched; per key, the open row is replayed as the
    * seed change (its stored valid_from / seq) together with the
    * batch's changes, through the SAME [[history]] mechanism — so
    * no-op batch changes collapse into the in-force version and the
    * fold law holds by construction. Keys that appear only in the
    * batch are born normally.
    *
    * `strict` (default true) refuses — loudly, in-plan — any batch
    * change that would sort AT OR BEFORE its key's open version under
    * the (ts, seq) order: a change dated before the open valid_from
    * belongs to the closed region, and a change at EXACTLY the open
    * valid_from with seq ≤ the open row's stored seq would slot before
    * the replayed seed, silently rewriting what [[history]] already
    * decided (e.g. resurrecting a closed zero-length version the
    * replay-side dedup cannot see). Rewriting decided history is a
    * correction workload, not a merge (run [[history]] over the
    * corrected feed instead).
    *
    * ONE exemption, for at-least-once change feeds: a batch row that
    * is the open version's EXACT re-delivery — equal ts, equal seq,
    * AND equal attribute tuple — is a provable no-op (it collapses
    * into the replayed seed identically regardless of sort order), so
    * the guard passes it through instead of failing a feed that merely
    * re-sent the boundary change it already merged. A row at the open
    * (ts, seq) with DIFFERENT attributes still raises: which of the
    * two tuples wins would be sort-nondeterministic. */
  def merge(current: DataFrame, batch: DataFrame, keyCol: String,
      attrCols: Seq[String], tsCol: String, seqCol: String,
      strict: Boolean = true): DataFrame = {
    val closed = current.filter(col("valid_to").isNotNull)
    val open = current.filter(col("valid_to").isNull)
    val openAsChanges = open.select((Seq(col(keyCol)) ++ attrCols.map(col) ++
      Seq(col("valid_from").as(tsCol), col("seq").as(seqCol))): _*)
    val batchCols = Seq(col(keyCol)) ++ attrCols.map(col) ++
      Seq(col(tsCol), col(seqCol))
    val guarded =
      if (!strict) batch.select(batchCols: _*)
      else batch.select(batchCols: _*)
        .join(open.select(col(keyCol),
            col("valid_from").as("__scd_open_from"),
            col("seq").as("__scd_open_seq"),
            struct(attrCols.map(col): _*).as("__scd_open_attrs")),
          Seq(keyCol), "left")
        .withColumn(tsCol,
          when(col("__scd_open_from").isNotNull &&
              (col(tsCol) < col("__scd_open_from") ||
                (col(tsCol) === col("__scd_open_from") &&
                  col(seqCol) <= col("__scd_open_seq") &&
                  // the at-least-once exemption: an exact re-delivery
                  // of the open version (ts, seq, attrs all equal) is
                  // a provable no-op, not a history rewrite
                  !(col(seqCol) === col("__scd_open_seq") &&
                    (struct(attrCols.map(col): _*) <=>
                      col("__scd_open_attrs"))))),
            raise_error(concat(
              lit("Scd2.merge: change for key "), col(keyCol).cast("string"),
              lit(" at ("), col(tsCol).cast("string"),
              lit(", seq "), col(seqCol).cast("string"),
              lit(") does not sort after the open version's ("),
              col("__scd_open_from").cast("string"),
              lit(", seq "), col("__scd_open_seq").cast("string"),
              lit(") - decided history is immutable; rebuild via Scd2.history"))))
            .otherwise(col(tsCol)))
        .drop("__scd_open_from", "__scd_open_seq", "__scd_open_attrs")
    closed.unionByName(
      history(openAsChanges.unionByName(guarded), keyCol, attrCols,
        tsCol, seqCol))
  }

  /** The SCD2 temporal lookup — enrich facts with the dimension
    * version IN FORCE at each fact's time (the star-schema "as-of"
    * join every warehouse query against a versioned dimension is):
    * fact matches the dim row with fact.key = dim.key and
    * valid_from ≤ fact.ts < valid_to (open rows unbounded above).
    * LEFT join: facts before their key's first version (or with no
    * key match) keep NULL attributes — a miss is information.
    *
    * At most ONE version matches per fact BY CONSTRUCTION: a key's
    * intervals partition time (same-timestamp versions leave a
    * zero-length [t, t) that matches nothing — the tie-break
    * semantics [[history]] pins). Scd2Spec asserts the no-duplication
    * law on a tie-heavy fixture.
    *
    * Scale shape: one shuffle of both sides on the key
    * (`shuffle_hash` pinned — a versioned dimension at 100 TB is not
    * broadcastable and AQE must not guess otherwise); the interval
    * predicate rides the join, and per-key work is bounded by the
    * key's version count. */
  def lookupAsOf(facts: DataFrame, dim: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val dimSide = dim.select(
      col(keyCol), col("valid_from"), col("valid_to"),
      col("seq").as("version_seq"),
      struct(dim.columns.filterNot(c =>
        c == keyCol || c == "valid_from" || c == "valid_to" ||
        c == "seq" || c == "is_current").map(col): _*).as("__scd_attrs"))
      .hint("shuffle_hash")
    // drop via the dim-side references, not by bare name: drop-by-name
    // removes EVERY occurrence, so a facts side that happens to carry
    // its own valid_from/valid_to would silently lose those columns
    facts.join(dimSide,
      facts(keyCol) === dimSide(keyCol) &&
        dimSide("valid_from") <= col(tsCol) &&
        (dimSide("valid_to").isNull || col(tsCol) < dimSide("valid_to")),
      "left")
      .drop(dimSide(keyCol))
      .drop(dimSide("valid_from"))
      .drop(dimSide("valid_to"))
  }
}
