package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative table-level data-quality constraints (the Deequ /
  * "unit tests for data" shape): a suite of checks compiles into ONE
  * aggregation pass over the table — completeness, uniqueness, range
  * containment, row-count bounds — plus one anti-join per referential
  * check. The reference's validation surface is row-level (P13/P14
  * predicates); a warehouse load ALSO gates on table-level invariants
  * before publishing, and that is this operator.
  *
  * Every metric is an exact integer permille (x·1000 div y — no float
  * accumulation), so the q214 oracle recomputes metrics and verdicts
  * value-for-value. Vacuous truth on empty denominators (empty table ⇒
  * completeness/uniqueness 1000; zero non-null values ⇒ range/FK 1000)
  * — the conventional constraint semantics, documented here because it
  * IS a choice.
  *
  * Scale shape: the non-referential suite is one hash aggregation
  * (distinct counts expand map-side like any count-distinct);
  * referential checks are one key-vocabulary anti-join each. The
  * result is suite-sized — a LocalRelation assembled from one
  * collected row per pass (the knBigramModel discipline). */
object QualityChecks {

  sealed trait Check { def id: String }

  /** Non-null fraction of `column` ≥ minMilli. */
  final case class Completeness(column: String, minMilli: Long = 1000L)
      extends Check { def id = s"completeness($column)" }

  /** Distinct fraction of the column tuple ≥ minMilli (1000 = the
    * tuple is a key).
    *
    * Contract note for Deequ-literate readers: this metric is Deequ's
    * DISTINCTNESS (countDistinct / count), NOT Deequ's uniqueness
    * (fraction of values occurring exactly ONCE) — a tuple appearing
    * twice contributes 1/2 here but 0 there. Null handling is Spark's
    * countDistinct semantics: a tuple containing any NULL is dropped
    * from the NUMERATOR while the denominator `count(*)` keeps the
    * row, so null-bearing rows strictly lower the metric (an all-null
    * column scores 0 on a non-empty table). QualityChecksSpec pins
    * both behaviours on a null-mix fixture. */
  final case class Uniqueness(columns: Seq[String], minMilli: Long = 1000L)
      extends Check { def id = s"uniqueness(${columns.mkString(",")})" }

  /** Fraction of NON-NULL values inside [lo, hi] ≥ minMilli. */
  final case class InRange(column: String, lo: Double, hi: Double,
      minMilli: Long = 1000L)
      extends Check { def id = s"in_range($column,$lo,$hi)" }

  /** lo ≤ row count ≤ hi; the metric IS the count. */
  final case class RowCountBetween(lo: Long, hi: Long)
      extends Check { def id = s"row_count($lo,$hi)" }

  /** Fraction of non-null `column` values present in
    * `refName.refColumn` ≥ minMilli (1000 = referential integrity). */
  final case class ForeignKey(column: String, refName: String,
      ref: DataFrame, refColumn: String, minMilli: Long = 1000L)
      extends Check { def id = s"foreign_key($column->$refName.$refColumn)" }

  private def permille(num: Long, den: Long): Long =
    if (den == 0L) 1000L else num * 1000L / den

  /** Run the suite: (check_id, metric_milli, passed), ordered by
    * check_id. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    val spark = df.sparkSession
    import spark.implicits._
    val flat = checks.filter(!_.isInstanceOf[ForeignKey])
    // one aggregation pass for every non-referential check: count(*),
    // plus per-check non-null / distinct / in-range counters
    val aggs = scala.collection.mutable.ArrayBuffer[Column](
      count(lit(1)).as("__n"))
    flat.zipWithIndex.foreach { case (c, i) =>
      c match {
        case Completeness(col0, _) =>
          aggs += count(col(col0)).as(s"__m$i")
        case Uniqueness(cols, _) =>
          aggs += countDistinct(cols.head, cols.tail: _*).as(s"__m$i")
        case InRange(col0, lo, hi, _) =>
          aggs += sum(when(col(col0).between(lo, hi), 1L).otherwise(0L))
            .as(s"__m$i")
          aggs += count(col(col0)).as(s"__d$i")
        case RowCountBetween(_, _) => ()
        case _: ForeignKey => ()
      }
    }
    val row = df.agg(aggs.head, aggs.tail.toSeq: _*).collect()(0)
    val n = row.getLong(row.fieldIndex("__n"))
    def longAt(name: String): Long =
      Option(row.get(row.fieldIndex(name))).map(_.asInstanceOf[Long])
        .getOrElse(0L)
    val flatRows = flat.zipWithIndex.map { case (c, i) =>
      c match {
        case Completeness(_, minM) =>
          val m = permille(longAt(s"__m$i"), n); (c.id, m, m >= minM)
        case Uniqueness(_, minM) =>
          val m = permille(longAt(s"__m$i"), n); (c.id, m, m >= minM)
        case InRange(_, _, _, minM) =>
          val m = permille(longAt(s"__m$i"), longAt(s"__d$i"))
          (c.id, m, m >= minM)
        case RowCountBetween(lo, hi) =>
          (c.id, n, n >= lo && n <= hi)
        case other => sys.error(s"unreachable: $other")
      }
    }
    val fkRows = checks.collect { case fk @ ForeignKey(col0, _, ref, refCol, minM) =>
      val nonNull = df.filter(col(col0).isNotNull)
      val den = nonNull.count()
      val orphans = nonNull.select(col(col0).as("__k"))
        .join(ref.select(col(refCol).as("__k")), Seq("__k"), "left_anti")
        .count()
      val m = permille(den - orphans, den)
      (fk.id, m, m >= minM)
    }
    (flatRows ++ fkRows).toDF("check_id", "metric_milli", "passed")
      .orderBy(col("check_id"))
  }
}
