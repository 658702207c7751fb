package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scd2

/** SCD2 dimension versioning: interval semantics on hand cases, the
  * merge fold law at several split points, no-op suppression across the
  * batch boundary, and the strict out-of-order refusal.
  */
class Scd2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("scd2-spec", "4").getOrCreate()
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val feed = Seq(
    // key 1: a -> a (no-op) -> b -> b (no-op) -> c
    (1L, "a", ts("2024-01-01 00:00:00"), 1L),
    (1L, "a", ts("2024-01-02 00:00:00"), 2L),
    (1L, "b", ts("2024-01-03 00:00:00"), 3L),
    (1L, "b", ts("2024-01-04 00:00:00"), 4L),
    (1L, "c", ts("2024-01-05 00:00:00"), 5L),
    // key 2: single version
    (2L, "x", ts("2024-01-02 12:00:00"), 6L),
    // key 3: same-timestamp tie broken by seq -> zero-length interval
    (3L, "p", ts("2024-01-03 00:00:00"), 7L),
    (3L, "q", ts("2024-01-03 00:00:00"), 8L),
    // key 4: born after every split point below
    (4L, "z", ts("2024-01-09 00:00:00"), 9L)
  ).toDF("k", "attr", "ts", "seq")

  private def collectHist(df: org.apache.spark.sql.DataFrame) =
    df.select(col("k"), col("attr"),
        col("valid_from").cast("string"), col("valid_to").cast("string"),
        col("seq"), col("is_current"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), r.getLong(4), r.getBoolean(5)))
      .toSet

  test("history: intervals, no-op suppression, tie-broken same-ts versions") {
    val h = collectHist(Scd2.history(feed, "k", Seq("attr"), "ts", "seq"))
    assert(h == Set(
      (1L, "a", "2024-01-01 00:00:00", Some("2024-01-03 00:00:00"), 1L, false),
      (1L, "b", "2024-01-03 00:00:00", Some("2024-01-05 00:00:00"), 3L, false),
      (1L, "c", "2024-01-05 00:00:00", None, 5L, true),
      (2L, "x", "2024-01-02 12:00:00", None, 6L, true),
      (3L, "p", "2024-01-03 00:00:00", Some("2024-01-03 00:00:00"), 7L, false),
      (3L, "q", "2024-01-03 00:00:00", None, 8L, true),
      (4L, "z", "2024-01-09 00:00:00", None, 9L, true)), h.toString)
  }

  test("merge fold law: merge(history(early), late) == history(all) at every split") {
    val all = collectHist(Scd2.history(feed, "k", Seq("attr"), "ts", "seq"))
    for (splitDay <- Seq("2024-01-01 12:00:00", "2024-01-02 12:00:00",
        "2024-01-03 12:00:00", "2024-01-06 00:00:00")) {
      val early = feed.filter(col("ts") <= ts(splitDay))
      val late = feed.filter(col("ts") > ts(splitDay))
      val merged = collectHist(Scd2.merge(
        Scd2.history(early, "k", Seq("attr"), "ts", "seq"),
        late, "k", Seq("attr"), "ts", "seq"))
      assert(merged == all, s"split at $splitDay: $merged")
    }
  }

  test("merge: three-way fold equals the one-shot history") {
    val all = collectHist(Scd2.history(feed, "k", Seq("attr"), "ts", "seq"))
    val b1 = feed.filter(col("ts") <= ts("2024-01-02 12:00:00"))
    val b2 = feed.filter(col("ts") > ts("2024-01-02 12:00:00") &&
      col("ts") <= ts("2024-01-04 12:00:00"))
    val b3 = feed.filter(col("ts") > ts("2024-01-04 12:00:00"))
    val folded = collectHist(Scd2.merge(
      Scd2.merge(Scd2.history(b1, "k", Seq("attr"), "ts", "seq"),
        b2, "k", Seq("attr"), "ts", "seq"),
      b3, "k", Seq("attr"), "ts", "seq"))
    assert(folded == all)
  }

  test("merge: batch no-op against the open version is suppressed") {
    val init = Scd2.history(
      Seq((1L, "a", ts("2024-01-01 00:00:00"), 1L)).toDF("k", "attr", "ts", "seq"),
      "k", Seq("attr"), "ts", "seq")
    val merged = collectHist(Scd2.merge(init,
      Seq((1L, "a", ts("2024-01-05 00:00:00"), 2L)).toDF("k", "attr", "ts", "seq"),
      "k", Seq("attr"), "ts", "seq"))
    assert(merged == Set(
      (1L, "a", "2024-01-01 00:00:00", None, 1L, true)), merged.toString)
  }

  test("merge: strict mode refuses a change that predates the open version") {
    val init = Scd2.history(
      Seq((1L, "a", ts("2024-01-05 00:00:00"), 1L)).toDF("k", "attr", "ts", "seq"),
      "k", Seq("attr"), "ts", "seq")
    val bad = Seq((1L, "b", ts("2024-01-02 00:00:00"), 2L))
      .toDF("k", "attr", "ts", "seq")
    val e = intercept[Exception] {
      Scd2.merge(init, bad, "k", Seq("attr"), "ts", "seq").collect()
    }
    assert(e.getMessage.contains("does not sort after the open version"),
      e.getMessage)
    // non-strict absorbs it into the replayed open segment (documented
    // escape hatch for correction feeds that rebuild anyway)
    val lax = Scd2.merge(init, bad, "k", Seq("attr"), "ts", "seq",
      strict = false).collect()
    assert(lax.nonEmpty)
  }

  test("merge: strict refuses a same-timestamp change with seq <= the open seq") {
    // open row at (01-05, seq 3); a batch change at the SAME ts with a
    // SMALLER seq would slot before the replayed seed and rewrite what
    // history already decided (the dedup can't see closed rows) — refuse
    val init = Scd2.history(Seq(
      (1L, "a", ts("2024-01-05 00:00:00"), 2L),
      (1L, "b", ts("2024-01-05 00:00:00"), 3L)
    ).toDF("k", "attr", "ts", "seq"), "k", Seq("attr"), "ts", "seq")
    for (badSeq <- Seq(1L, 3L)) { // before the seed, and equal to it
      val bad = Seq((1L, "c", ts("2024-01-05 00:00:00"), badSeq))
        .toDF("k", "attr", "ts", "seq")
      val e = intercept[Exception] {
        Scd2.merge(init, bad, "k", Seq("attr"), "ts", "seq").collect()
      }
      assert(e.getMessage.contains("does not sort after the open version"),
        s"seq $badSeq: ${e.getMessage}")
    }
  }

  test("merge: exact re-delivery of the open version is an exempt no-op") {
    // an at-least-once feed re-sends the boundary change it already
    // merged: equal (ts, seq, attrs) is provably a no-op, so strict
    // mode passes it through and the table is unchanged
    val init = Scd2.history(Seq(
      (1L, "a", ts("2024-01-05 00:00:00"), 2L),
      (1L, "b", ts("2024-01-05 00:00:00"), 3L)
    ).toDF("k", "attr", "ts", "seq"), "k", Seq("attr"), "ts", "seq")
    val redelivered = Seq((1L, "b", ts("2024-01-05 00:00:00"), 3L))
      .toDF("k", "attr", "ts", "seq")
    val merged = collectHist(
      Scd2.merge(init, redelivered, "k", Seq("attr"), "ts", "seq"))
    assert(merged == collectHist(init), merged.toString)
    // same (ts, seq) but a DIFFERENT attribute tuple is NOT a
    // re-delivery — which tuple wins would be sort-nondeterministic,
    // so the guard still refuses it
    val conflicting = Seq((1L, "c", ts("2024-01-05 00:00:00"), 3L))
      .toDF("k", "attr", "ts", "seq")
    val e = intercept[Exception] {
      Scd2.merge(init, conflicting, "k", Seq("attr"), "ts", "seq").collect()
    }
    assert(e.getMessage.contains("does not sort after the open version"),
      e.getMessage)
  }

  test("merge: same-timestamp change with seq > open seq folds like history") {
    // the legal side of the boundary: ties AFTER the open seq are a
    // normal same-instant version chain, and merge == one-shot history
    val f = Seq(
      (1L, "a", ts("2024-01-05 00:00:00"), 2L),
      (1L, "b", ts("2024-01-05 00:00:00"), 5L)
    ).toDF("k", "attr", "ts", "seq")
    val all = collectHist(Scd2.history(f, "k", Seq("attr"), "ts", "seq"))
    val merged = collectHist(Scd2.merge(
      Scd2.history(f.filter(col("seq") === 2L), "k", Seq("attr"), "ts", "seq"),
      f.filter(col("seq") === 5L), "k", Seq("attr"), "ts", "seq"))
    assert(merged == all, merged.toString)
  }

  test("lookupAsOf: in-force version per fact, misses null, boundaries half-open") {
    val dim = Scd2.history(Seq(
      (1L, "a", 1000L, 1L), (1L, "b", 2000L, 2L), (1L, "c", 3000L, 3L),
      // key 2: same-ts tie -> p holds a zero-length [t, t) interval
      (2L, "p", 5000L, 4L), (2L, "q", 5000L, 5L)
    ).toDF("k", "attr", "ts", "seq"), "k", Seq("attr"), "ts", "seq")
    val facts = Seq(
      (10L, 1L, 500L),  // before first version -> null
      (11L, 1L, 1000L), // exactly at a valid_from -> that version
      (12L, 1L, 1999L), // inside [1000, 2000)
      (13L, 1L, 2000L), // boundary -> the NEW version (half-open)
      (14L, 1L, 9999L), // open row
      (15L, 2L, 5000L), // tie instant: zero-length p matches nothing -> q
      (16L, 3L, 1000L)  // unknown key -> null
    ).toDF("fid", "k", "ts")
    val out = Scd2.lookupAsOf(facts, dim, "k", "ts")
    assert(out.count() == facts.count(), "lookup must never multiply facts")
    val m = out.collect().map(r => r.getLong(0) ->
      Option(r.get(r.fieldIndex("__scd_attrs")))
        .map(_.asInstanceOf[org.apache.spark.sql.Row].getString(0))).toMap
    assert(m(10L).isEmpty && m(16L).isEmpty)
    assert(m(11L).contains("a") && m(12L).contains("a"))
    assert(m(13L).contains("b") && m(14L).contains("c"))
    assert(m(15L).contains("q"), s"tie instant: ${m(15L)}")
  }

  test("lookupAsOf: facts-side valid_from/valid_to columns survive the join") {
    // drop-by-name would remove EVERY occurrence; the dim-side-reference
    // drop keeps fact columns that happen to share the interval names
    val dim = Scd2.history(
      Seq((1L, "a", 1000L, 1L)).toDF("k", "attr", "ts", "seq"),
      "k", Seq("attr"), "ts", "seq")
    val facts = Seq((10L, 1L, 1500L, 777L, 888L))
      .toDF("fid", "k", "ts", "valid_from", "valid_to")
    val out = Scd2.lookupAsOf(facts, dim, "k", "ts")
    assert(out.columns.count(_ == "valid_from") == 1 &&
      out.columns.count(_ == "valid_to") == 1, out.columns.mkString(","))
    val r = out.collect()(0)
    assert(r.getLong(r.fieldIndex("valid_from")) == 777L &&
      r.getLong(r.fieldIndex("valid_to")) == 888L)
    assert(r.getStruct(r.fieldIndex("__scd_attrs")).getString(0) == "a")
  }

  test("merge: multi-attribute change detection uses the full tuple") {
    val f = Seq(
      (1L, "a", 10L, ts("2024-01-01 00:00:00"), 1L),
      (1L, "a", 20L, ts("2024-01-02 00:00:00"), 2L), // second attr changes
      (1L, "a", 20L, ts("2024-01-03 00:00:00"), 3L)  // no-op
    ).toDF("k", "attr", "v", "ts", "seq")
    val h = Scd2.history(f, "k", Seq("attr", "v"), "ts", "seq")
      .select(col("seq"), col("is_current")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(h == Map(1L -> false, 2L -> true), h.toString)
  }
}
