package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics

class EventAnalyticsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  test("funnel: ordered steps, first-touch anchor, window cutoff") {
    val ev = Seq(
      // user 1 completes A→B→C in order
      (1L, "A", ts(0)), (1L, "B", ts(10)), (1L, "C", ts(20)),
      // user 2: B before A — B does not count, funnel stops at A
      (2L, "B", ts(0)), (2L, "A", ts(5)), (2L, "C", ts(50)),
      // user 3: A then B outside the 30-min window
      (3L, "A", ts(0)), (3L, "B", ts(40)), (3L, "C", ts(45)),
      // user 4: never does A
      (4L, "B", ts(0)), (4L, "C", ts(1))
    ).toDF("u", "t", "ts")
    val got = EventAnalytics.funnel(ev, "u", "t", "ts", Seq("A", "B", "C"),
        withinMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, "A", 3L), (2L, "B", 1L), (3L, "C", 1L)))
  }

  test("funnel: zero window means unlimited; same-timestamp step counts") {
    val ev = Seq(
      (1L, "A", ts(0)), (1L, "B", ts(0)), // simultaneous: ts >= anchor passes
      (2L, "A", ts(0)), (2L, "B", ts(100000))
    ).toDF("u", "t", "ts")
    val got = EventAnalytics.funnel(ev, "u", "t", "ts", Seq("A", "B"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got === Seq((1L, 2L), (2L, 2L)))
  }

  test("funnel: first-touch anchoring is deliberate (re-entry not retried)") {
    // user's first A has no B within window; a later A would have one —
    // documented semantics: anchored at FIRST A, so the funnel stalls
    val ev = Seq((1L, "A", ts(0)), (1L, "A", ts(100)), (1L, "B", ts(110)))
      .toDF("u", "t", "ts")
    val got = EventAnalytics.funnel(ev, "u", "t", "ts", Seq("A", "B"),
        withinMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got === Seq((1L, 1L), (2L, 0L)))
  }

  test("retention: cohort triangle with exact counts") {
    def d(day: Int) = ts(day * 1440L)
    val ev = Seq(
      (1L, d(0)), (1L, d(1)), (1L, d(3)),
      (2L, d(0)), (2L, d(1)),
      (3L, d(1)), (3L, d(2)),
      (1L, d(0)) // duplicate user-day collapses
    ).toDF("u", "ts")
    val got = EventAnalytics.retention(ev, "u", "ts", maxDays = 7)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val c0 = new java.sql.Date(ts(0).getTime).toString
    val c1 = new java.sql.Date(ts(1440).getTime).toString
    assert(got === Seq(
      (c0, 0L, 2L, 2L), (c0, 1L, 2L, 2L), (c0, 3L, 1L, 2L),
      (c1, 0L, 1L, 1L), (c1, 1L, 1L, 1L)))
  }

  test("retention: maxDays drops the tail") {
    val ev = Seq((1L, ts(0)), (1L, ts(10L * 1440L))).toDF("u", "ts")
    val got = EventAnalytics.retention(ev, "u", "ts", maxDays = 7).count()
    assert(got === 1L)
  }
}
