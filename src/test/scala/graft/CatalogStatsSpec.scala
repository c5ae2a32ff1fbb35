package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import graft.operators.CatalogStats

/** The stats-driven plan difference (r8 verdict item 3): ANALYZE'd
  * catalog statistics must change the JOIN DECISION — broadcast the
  * selectively-filtered side instead of shuffling both — while never
  * changing results. Pinned with a self-calibrating broadcast
  * threshold placed strictly between the stats-aware and stats-blind
  * size estimates, so the assertion holds at any scale factor. */
class CatalogStatsSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def collectJoins(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case j: BroadcastHashJoinExec => j; case j: SortMergeJoinExec => j }

  test("ANALYZE'd column stats collapse the filter estimate by orders of magnitude") {
    withConf("spark.sql.cbo.enabled" -> "true") {
      val (o, _) = CatalogStats.ensureAnalyzed(spark, Sf001)
      val pred = col("o_totalprice") > CatalogStats.PriceFloor
      val statsEst = spark.table(o).filter(pred)
        .queryExecution.optimizedPlan.stats
      val rawEst = spark.read.parquet(s"$Sf001/orders.parquet").filter(pred)
        .queryExecution.optimizedPlan.stats
      // without column stats the Filter inherits its child's full
      // size — the 100 TB-fact-table blindness this operator fixes
      assert(statsEst.sizeInBytes * BigInt(10) < rawEst.sizeInBytes,
        s"stats $statsEst vs raw $rawEst: column stats must collapse the estimate")
      val total = spark.read.parquet(s"$Sf001/orders.parquet").count()
      assert(statsEst.rowCount.exists(_ < total / 50),
        s"row estimate ${statsEst.rowCount} must reflect the ~0.2% tail of $total")
    }
  }

  test("stats flip the join from shuffle to broadcast; results are identical") {
    withConf("spark.sql.cbo.enabled" -> "true",
             // pin the STATIC decision: AQE could rescue the
             // stats-blind plan at runtime from observed shuffle
             // sizes — the point here is the planner never needs
             // rescuing when the catalog carries stats
             "spark.sql.adaptive.enabled" -> "false") {
      val pred = col("o_totalprice") > CatalogStats.PriceFloor
      val (o, c) = CatalogStats.ensureAnalyzed(spark, Sf001)
      // calibrate on the COLUMN-PRUNED shapes the join actually
      // plans (the broadcast decision sees projection-scaled sizes,
      // not whole-table scans)
      val statsOrdersEst = spark.table(o).filter(pred)
        .select("o_custkey", "o_totalprice")
        .queryExecution.optimizedPlan.stats.sizeInBytes
      val rawOrdersEst = spark.read.parquet(s"$Sf001/orders.parquet").filter(pred)
        .select("o_custkey", "o_totalprice")
        .queryExecution.optimizedPlan.stats.sizeInBytes
      val rawCustEst = spark.read.parquet(s"$Sf001/customer.parquet")
        .select("c_custkey", "c_mktsegment")
        .queryExecution.optimizedPlan.stats.sizeInBytes
      // a threshold no stats-blind side fits under, but the
      // stats-estimated filtered tail does
      val ceiling = rawOrdersEst.min(rawCustEst)
      assert(statsOrdersEst < ceiling,
        s"calibration: stats est $statsOrdersEst must undercut raw ests $ceiling")
      val threshold = (statsOrdersEst + ceiling) / 2
      withConf("spark.sql.autoBroadcastJoinThreshold" -> threshold.toString) {
        val statsDf = CatalogStats.joinWithStats(spark, Sf001)
        val noStatsDf = CatalogStats.joinNoStats(spark, Sf001)
        val statsJoins = collectJoins(statsDf.queryExecution.executedPlan)
        val noStatsJoins = collectJoins(noStatsDf.queryExecution.executedPlan)
        assert(statsJoins.exists(_.isInstanceOf[BroadcastHashJoinExec]),
          s"with ANALYZE stats the filtered side must broadcast:\n${statsDf.queryExecution.executedPlan}")
        assert(noStatsJoins.exists(_.isInstanceOf[SortMergeJoinExec]) &&
          !noStatsJoins.exists(_.isInstanceOf[BroadcastHashJoinExec]),
          s"stats-blind twin must shuffle both sides:\n${noStatsDf.queryExecution.executedPlan}")
        // statistics change plans, never answers (the shared-oracle
        // contract of the registered pair)
        def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
        assert(norm(statsDf) == norm(noStatsDf))
      }
    }
  }

  test("ANALYZE stats enable cost-based join REORDERING of an adversarial order") {
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    import org.apache.spark.sql.catalyst.catalog.HiveTableRelation
    import org.apache.spark.sql.execution.datasources.LogicalRelationWithTable
    // leaf tables of a logical plan, left-to-right — the join order
    def leafOrder(p: LogicalPlan): Seq[String] = p.collect {
      case r: HiveTableRelation => r.tableMeta.identifier.table
      case LogicalRelationWithTable(_, Some(t)) => t.identifier.table
    }
    withConf("spark.sql.cbo.enabled" -> "true",
             "spark.sql.cbo.joinReorder.enabled" -> "true",
             "spark.sql.adaptive.enabled" -> "false") {
      val Seq(oT, cT, lT) = CatalogStats.ensureAnalyzedTables(
        spark, Sf001, Seq("orders", "customer", "lineitem"))
      // adversarial SYNTACTIC order: start from the unfiltered
      // customer x orders pair, join the heavily-filtered lineitem
      // last — the order a cost-blind planner keeps. l_quantity > 49
      // keeps ~2% of lineitem, so the cheapest tree joins THAT side
      // first; only column stats reveal it.
      def query(reorder: Boolean) = {
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", reorder.toString)
        spark.table(cT)
          .join(spark.table(oT), col("c_custkey") === col("o_custkey"))
          .join(spark.table(lT).filter(col("l_quantity") > 49),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_items"))
      }
      val syntactic = leafOrder(query(reorder = false).queryExecution.optimizedPlan)
      val reordered = leafOrder(query(reorder = true).queryExecution.optimizedPlan)
      assert(syntactic.indexWhere(_.startsWith("customer")) <
        syntactic.indexWhere(_.startsWith("lineitem")),
        s"calibration: the syntactic plan keeps customer before lineitem: $syntactic")
      assert(reordered != syntactic,
        s"stats + CBO must reorder the adversarial join: $reordered")
      assert(reordered.indexWhere(_.startsWith("lineitem")) <
        reordered.indexWhere(_.startsWith("customer")),
        s"the filtered fact side must join before the dimension: $reordered")
      // and reordering never changes answers
      def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(norm(query(reorder = true)) == norm(query(reorder = false)))
    }
  }

  test("registered twins agree without any conf tuning (the Verify posture)") {
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(norm(CatalogStats.joinWithStats(spark, Sf001)) ==
      norm(CatalogStats.joinNoStats(spark, Sf001)))
  }
}
