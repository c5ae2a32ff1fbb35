package graft

import graft.operators.EventsOps

class EventsOpsSpec extends SparkSpec {

  /** events-shaped frame; ts given in SECONDS, stored as long nanos
    * (the shape the production read path produces under
    * nanosAsLong=true). */
  private def eventsDf(rows: (Long, Long, Long, String, Double, String)*) = {
    val s = spark
    import s.implicits._
    rows.map { case (id, sec, uid, typ, v, props) => (id, sec * 1000000000L, uid, typ, v, props) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("window agg buckets on 600s boundaries with exact cent sums") {
    val e = eventsDf(
      (1L, 0L, 1L, "click", 1.10, "{}"),
      (2L, 599L, 1L, "click", 2.20, "{}"),
      (3L, 600L, 1L, "click", 4.40, "{}"))
    val out = EventsOps.windowAgg(e).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map(0L -> (2L, 3.30), 600L -> (1L, 4.40)))
  }

  test("sessionize splits on gaps > 30min and aggregates per session") {
    val e = eventsDf(
      (1L, 0L, 7L, "click", 1.0, "{}"),
      (2L, 1000L, 7L, "click", 2.0, "{}"),   // same session (gap 1000s)
      (3L, 4000L, 7L, "click", 3.0, "{}"),   // gap 3000s > 1800 -> new session
      (4L, 0L, 8L, "view", 5.0, "{}"))       // other user
    val out = EventsOps.sessionize(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(5), r.getDouble(6))).toMap
    assert(out((7L, 1L)) == (2L, 1000L, 3.0))  // n_events, duration, sum
    assert(out((7L, 2L)) == (1L, 0L, 3.0))
    assert(out((8L, 1L)) == (1L, 0L, 5.0))
  }

  test("range join pairs purchases with clicks within the window, across bucket edges") {
    val e = eventsDf(
      (1L, 1000L, 1L, "click", 0.0, "{}"),     // 200s before purchase -> in range
      (2L, 1190L, 1L, "click", 0.0, "{}"),     // 10s before, different 600s bucket edge
      (3L, 1200L, 1L, "purchase", 9.0, "{}"),
      (4L, 1900L, 1L, "click", 0.0, "{}"),     // 700s after -> OUT of range
      (5L, 1300L, 2L, "click", 0.0, "{}"),     // other user -> never joins
      (6L, 500L, 1L, "click", 0.0, "{}"))      // 700s before -> OUT
    val out = EventsOps.rangeJoin(e).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(out.toSet == Set((3L, 1L, -200000000L), (3L, 2L, -10000000L)))
    // each in-range pair appears exactly once (single-bucket match side)
    assert(out.length == out.toSet.size)
  }

  test("props agg extracts the k metric") {
    val e = eventsDf(
      (1L, 0L, 1L, "click", 0.0, "{\"k\": 7}"),
      (2L, 1L, 1L, "click", 0.0, "{\"k\": 11}"))
    val r = EventsOps.propsAgg(e).collect().head
    assert(r.getLong(1) == 2 && r.getLong(2) == 18 && r.getLong(3) == 7 && r.getLong(4) == 11)
  }

  test("as-of join matches each purchase to the latest preceding click") {
    val e = eventsDf(
      (1L, 100L, 7L, "click", 0.0, "{}"),
      (2L, 200L, 7L, "purchase", 0.0, "{}"),  // matches click 1
      (3L, 300L, 7L, "click", 0.0, "{}"),
      (4L, 400L, 7L, "purchase", 0.0, "{}"),  // matches click 3
      (5L, 50L, 8L, "purchase", 0.0, "{}"))   // no preceding click
    val out = EventsOps.asOfJoin(e).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out == Map(2L -> 1L, 4L -> 3L, 5L -> -1L))
  }

  test("microsCol also accepts real timestamp columns") {
    val s = spark
    import s.implicits._
    val e = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01.5"), 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val us = e.select(EventsOps.microsCol(e)).collect().head.getLong(0)
    assert(us == 1704067201500000L)
  }

  test("funnel counts first-click users and in-window conversions per day") {
    val day = 86400L
    val e = eventsDf(
      (1L, day + 100L, 1L, "click", 0.0, "{}"),
      (2L, day + 200L, 1L, "purchase", 0.0, "{}"),  // converts (100s after click)
      (3L, day + 300L, 2L, "click", 0.0, "{}"),
      (4L, day + 300L + 4000L, 2L, "purchase", 0.0, "{}"), // outside 1h window
      (5L, day + 400L, 3L, "click", 0.0, "{}"))            // no purchase at all
    val out = EventsOps.funnel(e).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(1L -> (3L, 1L)))
  }

  test("retention counts users active on consecutive days") {
    val day = 86400L
    val e = eventsDf(
      (1L, 100L, 1L, "view", 0.0, "{}"),
      (2L, day + 100L, 1L, "view", 0.0, "{}"),   // user 1 active day0+day1
      (3L, 200L, 2L, "view", 0.0, "{}"),          // user 2 only day0
      (4L, day + 200L, 3L, "view", 0.0, "{}"))    // user 3 only day1
    val out = EventsOps.retention(e).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(0L -> (2L, 1L), 1L -> (2L, 0L)))
  }
}
