package graft

import graft.operators.EventsOps
import org.apache.spark.sql.functions._

/** The native whole-operator as-of join (AsOfJoinNode/Exec) against
  * the oracle-checked window formulation, plus plan-shape and edge
  * semantics on crafted rows. */
class AsOfJoinSpec extends SparkSpec {

  private def events = spark.read.parquet(s"$Sf0001/events.parquet")

  test("native as-of equals the window formulation on sf0.001") {
    val a = EventsOps.asOfJoin(events).collect().map(_.toSeq).toSet
    val b = EventsOps.asOfJoinNative(events).collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a == b)
  }

  test("plan uses AsOfJoinExec with one exchange per side, no union") {
    val plan = EventsOps.asOfJoinNative(events).queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    assert(!plan.toLowerCase.contains("union"))
    assert(!plan.contains("Window"))
  }

  test("crafted rows: latest-preceding match, same-us tiebreak on seq, unmatched -> nulls") {
    import spark.implicits._
    // left (targets): (key, time, seq)
    val left = Seq(
      (1L, 100L, 10L), // after two matches -> picks time 90 (latest)
      (1L, 50L, 11L),  // before any match -> nulls
      (2L, 100L, 12L), // same-us match with smaller seq counts
      (3L, 100L, 13L)  // key with no matches at all -> nulls
    ).toDF("user_id", "us", "event_id")
    val right = Seq(
      (1L, 80L, 1L), (1L, 90L, 2L), (1L, 150L, 3L),
      (2L, 100L, 4L), // equal us, seq 4 < 12 -> matches
      (4L, 10L, 5L)
    ).toDF("m_user", "prev_match_us", "prev_match_id")
    val out = org.apache.spark.sql.graft.AsOfJoinApi.join(
        left, right, "user_id", "m_user", "us", "prev_match_us", "event_id", "prev_match_id")
      .select("user_id", "us", "event_id", "prev_match_us", "prev_match_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)))).toSet
    assert(out == Set(
      (1L, 100L, 10L, Some(90L), Some(2L)),
      (1L, 50L, 11L, None, None),
      (2L, 100L, 12L, Some(100L), Some(4L)),
      (3L, 100L, 13L, None, None)))
  }

  test("null right time/seq rows are skipped, not scan-blocking") {
    import spark.implicits._
    // Ascending sort puts nulls FIRST within a key group: the null-us
    // right row heads key 1's group. The scan must discard it and
    // still find the valid row behind it (the r02 advisory bug left
    // every left row of the key unmatched).
    val left = Seq((1L, 100L, 10L), (2L, 100L, 11L)).toDF("user_id", "us", "event_id")
    val right = Seq(
      (java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(1L)),
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(90L), java.lang.Long.valueOf(2L)),
      (java.lang.Long.valueOf(2L), java.lang.Long.valueOf(50L), null.asInstanceOf[java.lang.Long]),
      (java.lang.Long.valueOf(2L), java.lang.Long.valueOf(60L), java.lang.Long.valueOf(4L))
    ).toDF("m_user", "m_us", "m_id")
    val out = org.apache.spark.sql.graft.AsOfJoinApi.join(
        left, right, "user_id", "m_user", "us", "m_us", "event_id", "m_id")
      .select("user_id", "m_us", "m_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(out == Set(
      (1L, Some(90L), Some(2L)),
      (2L, Some(60L), Some(4L))))
  }

  test("randomized: native as-of equals a brute-force scala baseline") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val lRows = (1L to 250L).map(i => (rnd.nextInt(15).toLong, rnd.nextInt(1000).toLong, i))
    val rRows = (1001L to 1250L).map(i => (rnd.nextInt(15).toLong, rnd.nextInt(1000).toLong, i))
    val got = org.apache.spark.sql.graft.AsOfJoinApi.join(
        lRows.toDF("user_id", "us", "event_id"),
        rRows.toDF("m_user", "m_us", "m_id"),
        "user_id", "m_user", "us", "m_us", "event_id", "m_id")
      .select("event_id", "m_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    val expected = lRows.map { case (k, t, s) =>
      val best = rRows.filter { case (rk, rt, rs) =>
        rk == k && (rt < t || (rt == t && rs <= s))
      }.sortBy { case (_, rt, rs) => (rt, rs) }.lastOption
      s -> best.map(_._3)
    }.toMap
    assert(got == expected && expected.values.exists(_.nonEmpty))
  }

  test("non-long time column is rejected with a clear message") {
    import spark.implicits._
    val l = Seq((1L, "not-a-time", 1L)).toDF("user_id", "us", "event_id")
    val r = Seq((1L, 5L, 2L)).toDF("m_user", "m_us", "m_id")
    val e = intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.AsOfJoinApi.join(
        l, r, "user_id", "m_user", "us", "m_us", "event_id", "m_id")
    }
    assert(e.getMessage.contains("must be LongType"))
  }

  test("self-derived sides (shared lineage) are safe: fresh right exprIds") {
    import spark.implicits._
    val base = Seq((1L, 10L, 1L, "t"), (1L, 5L, 2L, "m"), (1L, 20L, 3L, "m"))
      .toDF("user_id", "us", "event_id", "kind")
    val l = base.filter(col("kind") === "t").select("user_id", "us", "event_id")
    val r = base.filter(col("kind") === "m")
      .select(col("user_id").as("m_user"), col("us").as("m_us"), col("event_id").as("m_id"))
    val rows = org.apache.spark.sql.graft.AsOfJoinApi.join(
        l, r, "user_id", "m_user", "us", "m_us", "event_id", "m_id")
      .collect()
    assert(rows.length == 1 && rows.head.getLong(4) == 5L)
  }
}
