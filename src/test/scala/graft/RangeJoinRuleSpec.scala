package graft

import graft.operators.EventsOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.RangeJoinRule

/** The optimizer-rule tier: naive |Δt| <= w joins rewritten into the
  * bucketed equi-join form, bit-identical results, no re-bucketing
  * of already-bucketed joins. */
class RangeJoinRuleSpec extends SparkSpec {

  private def events = spark.read.parquet(s"$Sf0001/events.parquet")

  test("naive range join equals the hand-bucketed form on sf0.001") {
    val a = EventsOps.rangeJoin(events).collect().map(_.toSeq).toSet
    val b = EventsOps.rangeJoinNative(events).collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a == b)
  }

  test("rewritten plan buckets (Generate) and stays an equi-join") {
    val plan = EventsOps.rangeJoinNative(events).queryExecution.executedPlan.toString
    assert(plan.contains("Generate"))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("pure interval join (no key equality) avoids the nested-loop plan") {
    RangeJoinRule.register(spark)
    import spark.implicits._
    val l = Seq((1L, 100L), (2L, 900L)).toDF("lid", "lt")
    val r = Seq((10L, 150L), (11L, 5000L)).toDF("rid", "rt")
    val joined = l.join(r, abs(col("lt") - col("rt")) <= lit(100L))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    val rows = joined.select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSet == Set((1L, 10L)))
  }

  test("negative times bucket correctly (floor-div, not truncate-toward-zero)") {
    RangeJoinRule.register(spark)
    import spark.implicits._
    // pairs straddling zero: -30 and +40 differ by 70 <= 100 but land
    // in different truncate-toward-zero buckets of width 100 (0 and 0
    // vs -0...) — floorDiv puts -30 in bucket -1, +40 in bucket 0,
    // adjacent, so the probe still finds the pair
    val l = Seq((1L, -30L), (2L, -250L), (3L, 130L)).toDF("lid", "lt")
    val r = Seq((10L, 40L), (11L, -260L), (12L, 500L)).toDF("rid", "rt")
    val got = l.join(r, abs(col("lt") - col("rt")) <= lit(100L))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val expected = (for {
      (lid, lt) <- Seq((1L, -30L), (2L, -250L), (3L, 130L))
      (rid, rt) <- Seq((10L, 40L), (11L, -260L), (12L, 500L))
      if math.abs(lt - rt) <= 100L
    } yield (lid, rid)).toSet
    assert(got == expected && got.contains((1L, 10L)))
  }

  test("randomized: rewritten join equals brute force incl. negative times and key skew") {
    RangeJoinRule.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val lRows = (1L to 300L).map(i => (i, rnd.nextInt(20).toLong, rnd.nextLong() % 5000L))
    val rRows = (1L to 300L).map(i => (i, rnd.nextInt(20).toLong, rnd.nextLong() % 5000L))
    val w = 137L
    val got = lRows.toDF("lid", "lk", "lt")
      .join(rRows.toDF("rid", "rk", "rt"),
        col("lk") === col("rk") && abs(col("lt") - col("rt")) <= lit(w))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (lid, lk, lt) <- lRows
      (rid, rk, rt) <- rRows
      if lk == rk && math.abs(lt - rt) <= w
    } yield (lid, rid)).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("unrelated left-side 3-element explode does NOT suppress the rewrite") {
    RangeJoinRule.register(spark)
    import spark.implicits._
    // the old structural guard keyed on "any 3-element integral
    // explode under the left child" and silently disabled the
    // rewrite a user asked for in exactly this shape
    val l = Seq((1L, 100L, Seq(7L, 8L, 9L)), (2L, 900L, Seq(1L, 2L, 3L)))
      .toDF("lid", "lt", "tags")
      .select(col("lid"), col("lt"), explode(col("tags")).as("tag"))
    val r = Seq((10L, 150L), (11L, 5000L)).toDF("rid", "rt")
    val joined = l.join(r, abs(col("lt") - col("rt")) <= lit(100L))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    val rows = joined.select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(rows.toSet == Set((1L, 10L)) && rows.length == 3) // one per exploded tag
  }

  test("cascaded range joins: a range join ABOVE a rewritten one is also rewritten") {
    RangeJoinRule.register(spark)
    import spark.implicits._
    // the old guard scanned the whole subtree for marker columns, so
    // the outer join here could never be rewritten and planned as a
    // nested-loop — cascaded interval joins are a real shape (e.g.
    // event -> sensor-window -> calibration-window)
    val a = Seq((1L, 100L), (2L, 900L)).toDF("aid", "at")
    val b = Seq((10L, 150L), (11L, 950L)).toDF("bid", "bt")
    val c = Seq((20L, 160L), (21L, 5000L)).toDF("cid", "ct")
    val inner = a.join(b, abs(col("at") - col("bt")) <= lit(100L))
    val outer = inner.join(c, abs(col("bt") - col("ct")) <= lit(50L))
    val plan = outer.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"outer range join fell back to a nested-loop plan:\n$plan")
    val rows = outer.select("aid", "bid", "cid").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(rows == Set((1L, 10L, 20L)))
  }

  test("already-bucketed join is not re-bucketed (single Generate)") {
    RangeJoinRule.register(spark)
    val optimized = EventsOps.rangeJoin(events).queryExecution.optimizedPlan
    val generates = optimized.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(generates.length == 1)
  }
}
