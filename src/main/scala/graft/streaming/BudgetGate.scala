package graft.streaming

import org.apache.spark.sql.Dataset

/** Streaming per-group token-budget admission — the q217 budget stage
  * as a stateful gate, completing the curation pipeline's streaming
  * story (quality / dedup / decon were already pure or first-seen
  * gates; the budget fill was the one batch-only stage).
  *
  * Semantics are EXACTLY the batch stage's prefix packing: per group,
  * a running total accumulates EVERY arriving row's weight (admitted
  * or not — the batch form computes the cumulative sum over all rows,
  * then filters), and a row is admitted iff the total INCLUDING it
  * stays ≤ the group's budget. So one oversized row closes the group
  * for good — later, smaller rows do not squeeze in — which is what
  * makes the streamed output equal the batch window's row-for-row
  * (StreamingSpec pins the parity against the registered q217 query).
  *
  * Caller contract (the first-seen-dedup replay contract): ids are
  * STRICTLY increasing per group across the whole stream; within a
  * batch the gate sorts each group's slice by id, so per-group
  * admission order is total and deterministic. The contract is
  * VALIDATED, not assumed (the raise_error guard discipline): the
  * gate tracks the max id it has folded per group and throws on an
  * id at or below it — whether the violation is a late-arriving
  * smaller id in a later batch or a duplicate id inside one batch.
  * Both would otherwise corrupt silently (a duplicate in one slice
  * double-charges the running total; a late id diverges from the
  * batch window), and which of the two happened must not depend on
  * where the micro-batch boundary fell. At-least-once sources must
  * dedupe ids (the first-seen gate upstream does) before this gate.
  *
  * Scale shape: state is TWO longs per group (the running total and
  * the max folded id — nothing grows with rows), per-batch work is a
  * sort of the batch's group slice. Groups absent from `budgets` get
  * `defaultBudget` (0 = closed, the q217 src2 stance made explicit).
  *
  * OPERATIONAL / RELEASE NOTE (also recorded in README.md §Operational
  * notes): the state schema changed from one long to the (total, maxId)
  * tuple when the order guard landed — a streaming query restarting
  * from a checkpoint written by the single-long version fails Spark's
  * state-store schema check (a generic StateSchemaNotCompatible error);
  * the fix is a fresh checkpoint directory, state-store schemas are not
  * migrated. The guard keys "has a prior id" on state EXISTENCE, so an
  * id of Long.MinValue is a legal first row (no sentinel in the id
  * domain). */
object BudgetGate {

  /** rows = (group, id, weight); emits the admitted subset. */
  def admit(rows: Dataset[(String, Long, Long)],
      budgets: Map[String, Long], defaultBudget: Long = 0L)
      : Dataset[(String, Long, Long)] = {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val outEnc = E.tuple(E.STRING, E.scalaLong, E.scalaLong)
    implicit val stEnc = E.tuple(E.scalaLong, E.scalaLong)
    rows.groupByKey(_._1)(E.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (g: String, it: Iterator[(String, Long, Long)],
            state: GroupState[(Long, Long)]) =>
          val budget = budgets.getOrElse(g, defaultBudget)
          var total = state.getOption.map(_._1).getOrElse(0L)
          // "has a prior id" is keyed on STATE EXISTENCE, not a sentinel:
          // a Long.MinValue seed would reject a legitimate first row whose
          // id IS Long.MinValue (sentinel colliding with the id domain)
          val priorMax: Option[Long] = state.getOption.map(_._2)
          val slice = it.toSeq.sortBy(_._2)
          // one check covers both violation shapes: fold the previous
          // batches' max through the sorted slice and any non-increase
          // (late smaller id OR within-batch duplicate) throws the same
          // way — behavior must not depend on micro-batch boundaries
          slice.foldLeft(priorMax) { (prev, r) =>
            prev.foreach { p =>
              if (r._2 <= p)
                throw new IllegalStateException(
                  s"BudgetGate: group '$g' received id ${r._2} at or below " +
                    s"the previously folded id $p - ids must be strictly " +
                    "increasing per group (a late or duplicate id would " +
                    "silently diverge from the batch window)")
            }
            Some(r._2)
          }
          val out = slice.flatMap { r =>
            total += r._3
            if (total <= budget) Some(r) else None
          }
          // update only when there is something to record: with NoTimeout
          // an empty slice never occurs, but if it did, writing the
          // MinValue placeholder with no folded id would re-create the
          // sentinel collision the Option guard above removes
          slice.lastOption.map(_._2).orElse(priorMax)
            .foreach(m => state.update((total, m)))
          out.iterator
      }
  }
}
