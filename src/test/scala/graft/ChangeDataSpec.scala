package graft

import graft.operators.ChangeData

class ChangeDataSpec extends SparkSpec {

  /** documents-shaped frame with the full column set cdcMerge reads. */
  private def fullDocs(ids: Long*) = {
    val s = spark
    import s.implicits._
    ids.map(id => (id, s"text $id", "en", "web", 7L + id))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("cdc merge is latest-wins: upserts override, deletes outrank, untouched keys survive") {
    // 1: snapshot only; 7: v1 upsert; 77: v1+v2 (v2 wins); 13: deleted;
    // 91 = 7*13: upsert then delete (delete wins)
    val merged = ChangeData.cdcMerge(fullDocs(1L, 7L, 77L, 13L, 91L))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!merged.contains(13L) && !merged.contains(91L), "deletes must remove the key")
    assert(merged(1L).getLong(1) == 0L && merged(1L).getLong(2) == 1L) // latest_version, n_revs
    assert(merged(1L).getAs[String]("text") == "text 1")
    assert(merged(7L).getLong(1) == 1L && merged(7L).getAs[String]("text") == "text 7 [rev1]")
    assert(merged(7L).getAs[Long]("n_chars") == 7L + 7L + 7L)
    assert(merged(77L).getLong(1) == 2L && merged(77L).getAs[String]("text") == "text 77 [rev2]",
      "the HIGHEST version must win when a key carries several upserts")
    assert(merged(77L).getLong(2) == 3L, "n_revs audits every record seen for the key")
  }

  test("cdc merge has no sort window: the plan reduces with an aggregate") {
    val plan = ChangeData.cdcMerge(fullDocs(1L, 7L)).queryExecution
      .executedPlan.toString
    assert(!plan.contains("Window"), s"latest-wins must be an aggregate, not a window:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
  }

  test("scd2 history collapses duplicate states and chains validity intervals") {
    val s = spark
    import s.implicits._
    // user 1: a a b a  -> states a, b, a (the repeat of 'a' collapses);
    // user 2: c        -> one open interval
    val events = Seq(
      (10L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 1L, "a", 0.0, "{}"),
      (11L, java.sql.Timestamp.valueOf("2026-01-01 00:01:00"), 1L, "a", 0.0, "{}"),
      (12L, java.sql.Timestamp.valueOf("2026-01-01 00:02:00"), 1L, "b", 0.0, "{}"),
      (13L, java.sql.Timestamp.valueOf("2026-01-01 00:03:00"), 1L, "a", 0.0, "{}"),
      (20L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 2L, "c", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val hist = ChangeData.scd2History(events).collect()
      .groupBy(_.getLong(0)).map { case (u, rows) =>
        u -> rows.sortBy(_.getLong(2)) // by valid_from_us
      }
    val u1 = hist(1L)
    assert(u1.map(_.getString(1)).toSeq == Seq("a", "b", "a"),
      "consecutive duplicate states must collapse, non-consecutive repeats must not")
    // each interval closes exactly where the next opens
    assert(u1(0).getLong(4) == u1(1).getLong(2) && u1(1).getLong(4) == u1(2).getLong(2))
    assert(u1.map(_.getLong(5)).toSeq == Seq(0L, 0L, 1L), "only the last row is current")
    assert(u1(2).isNullAt(4), "the current row's interval is open")
    val u2 = hist(2L)
    assert(u2.length == 1 && u2.head.getLong(5) == 1L)
  }

  test("scd2 history breaks timestamp ties deterministically by event_id") {
    val s = spark
    import s.implicits._
    val t = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val events = Seq(
      (2L, t, 1L, "b", 0.0, "{}"),
      (1L, t, 1L, "a", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val states = ChangeData.scd2History(events).collect()
      .sortBy(r => (r.getLong(2), r.getLong(3))).map(_.getString(1)).toSeq
    assert(states == Seq("a", "b"), "equal timestamps must order by event_id")
  }
}
