package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Invariant checks on the sf0.001 tables (the DuckDB oracle does
  * the exact value checking at sf0.01 — these guard shapes and
  * obvious semantics so failures localize). */
class RelationalSpec extends SparkSpec {

  test("q1: 6 flag/status groups, averages consistent with sums") {
    val rows = Relational.q1PricingSummary(spark, Sf0001).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val sumQty = r.getDouble(2); val avgQty = r.getDouble(6); val n = r.getLong(9)
      assert(math.abs(sumQty / n - avgQty) < 1e-9)
    }
  }

  test("q3: top-10, sorted by revenue desc") {
    val rev = Relational.q3ShippingPriority(spark, Sf0001).collect().map(_.getDouble(1))
    assert(rev.length <= 10 && rev.sameElements(rev.sortBy(-_)))
  }

  test("q4: semi join counts bounded by total orders") {
    val total = spark.read.parquet(s"$Sf0001/orders.parquet").count()
    val counted = Relational.q4OrderPriority(spark, Sf0001).collect().map(_.getLong(1)).sum
    assert(counted > 0 && counted <= total)
  }

  test("q22: anti join excludes exactly the urgent-order customers") {
    val cust = spark.read.parquet(s"$Sf0001/customer.parquet").count()
    val n = Relational.q22NoOrders(spark, Sf0001).collect().map(_.getLong(1)).sum
    assert(n > 0 && n < cust)
  }

  test("window top orders: at most 3 per customer, ranks 1..3") {
    val rows = Relational.windowTopOrders(spark, Sf0001).collect()
    val perCust = rows.groupBy(_.getLong(0)).values.map(_.length)
    assert(perCust.forall(_ <= 3))
    assert(rows.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 3))
  }

  test("rollup: grand total row present and equals sum of year rows") {
    val rows = Relational.rollupSales(spark, Sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    val grand = rows.find(r => r._1 == -1 && r._2 == -1).get
    val years = rows.filter(r => r._1 != -1 && r._2 == -1)
    assert(grand._3 == years.map(_._3).sum)
  }

  test("set ops: both+customer_only partitions the customer nation set") {
    val rows = Relational.setOps(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getInt(1)))
    val both = rows.filter(_._1 == "both").map(_._2).toSet
    val only = rows.filter(_._1 == "customer_only").map(_._2).toSet
    assert(both.intersect(only).isEmpty)
    assert((both ++ only).nonEmpty)
  }

  test("topk orders is 20 rows descending") {
    val p = Relational.topKOrders(spark, Sf0001).collect().map(_.getDouble(3))
    assert(p.length == 20 && p.sameElements(p.sortBy(-_)))
  }

  test("q7: only the two chosen nations appear, both directions") {
    // sf0.001 has no lineitem for this nation pair — use sf0.01
    val rows = Relational.q7VolumeShipping(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pair = Set(r.getString(0), r.getString(1))
      assert(pair == Set("NATION_1", "NATION_2"))
    }
  }

  test("q8: market share in [0,1] per year") {
    val rows = Relational.q8MarketShare(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
  }

  test("q13: custdist sums to the customer count (outer join keeps all)") {
    val cust = spark.read.parquet(s"$Sf0001/customer.parquet").count()
    val dist = Relational.q13OrderDistribution(spark, Sf0001).collect().map(_.getLong(1)).sum
    assert(dist == cust)
  }

  test("q15: every returned supplier has the same (max) revenue") {
    val rev = Relational.q15TopSupplier(spark, Sf0001).collect().map(_.getDouble(2))
    assert(rev.nonEmpty && rev.toSet.size == 1)
  }

  test("q16: only whitelisted sizes, no excluded brand/type") {
    val rows = Relational.q16SupplierCounts(spark, Sf0001).collect()
    val sizes = Set(1L, 4L, 9L, 14L, 19L, 23L, 36L, 45L)
    rows.foreach { r =>
      assert(r.getString(0) != "Brand#5" && r.getString(1) != "PROMO")
      assert(sizes.contains(r.getLong(2)))
    }
  }

  test("q2: every returned supplier achieves its part's minimum price") {
    val rows = Relational.q2MinCostSupplier(spark, Sf001).collect()
    assert(rows.nonEmpty)
    val perPart = rows.groupBy(_.getLong(0))
    perPart.values.foreach { rs =>
      assert(rs.map(_.getDouble(5)).distinct.length == 1) // all ties share the min
    }
  }

  test("q11: every kept supplier clears the 0.1% revenue threshold") {
    val rows = Relational.q11ImportantSuppliers(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val total = spark.read.parquet(s"$Sf0001/lineitem.parquet")
      .select(sum(round(col("l_extendedprice") * 100, 0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))).as("t"))
      .collect().head.getLong(0)
    rows.foreach(r => assert(r.getDouble(2) * 10000.0 > (total / 1000L).toDouble))
  }

  test("q20: dominant suppliers exceed twice their fair share of some part") {
    val rows = Relational.q20DominantSuppliers(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("q12: line counts sum to the number of late lines") {
    val rows = Relational.q12LateShipping(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val li = spark.read.parquet(s"$Sf0001/lineitem.parquet")
    val ord = spark.read.parquet(s"$Sf0001/orders.parquet")
    val late = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate").cast("date") > date_add(col("o_orderdate").cast("date"), 90))
      .count()
    assert(total == late)
  }

  test("stats_moments: agrees with Spark's own avg/var_samp/stddev/corr") {
    val rows = Relational.statsMoments(spark, Sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    val ref = spark.read.parquet(s"$Sf0001/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(avg("l_quantity"), var_samp("l_quantity"), stddev_samp("l_quantity"),
        corr(col("l_quantity"), col("l_discount")))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == ref.keySet)
    for ((k, r) <- rows; f <- 1 to 4)
      // float accumulation order differs in the reference path, so
      // compare to 1e-9 relative, not bitwise
      assert(math.abs(r.getDouble(f + 1) - ref(k).getDouble(f)) <=
        1e-9 * math.max(1.0, math.abs(ref(k).getDouble(f))), s"$k field $f")
  }

  test("q21: numwait descending with suppkey tiebreak, at most 20 rows") {
    val rows = Relational.q21SoleReturns(spark, Sf0001).collect()
      .map(r => (r.getLong(2), r.getLong(0)))
    assert(rows.length <= 20)
    assert(rows.sameElements(rows.sortBy(t => (-t._1, t._2))))
  }

  test("quantile gate: approx_percentile meets its rank-error contract") {
    val bits = Relational.quantileErrorGate(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bits == Map(5000L -> 1L, 9000L -> 1L, 9900L -> 1L),
      s"every quantile must be within n/accuracy rank error, got $bits")
    // a deliberately coarse sketch must still satisfy ITS OWN looser
    // contract (the gate scales with the configured accuracy)
    val coarse = Relational.quantileErrorGate(spark, Sf0001, accuracy = 50)
      .collect().map(r => r.getLong(1))
    assert(coarse.forall(_ == 1L))
  }

  test("bloom-pruned join: bit-identical to the plain join, prefilter in the plan") {
    val df = Relational.bloomPrunedJoin(spark, Sf0001)
    // the bloom prefilter must sit in the plan (fact rows die at the
    // scan, before the exchange) ...
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a bloom might_contain prefilter in:\n$plan")
    // ... and must not change the result: no false negatives, the
    // join drops the false positives
    val part = spark.read.parquet(s"$Sf0001/part.parquet")
      .filter(col("p_size") === 1)
    val li = spark.read.parquet(s"$Sf0001/lineitem.parquet")
    val plain = li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"),
        sum(Relational.cents(col("l_extendedprice")) *
          (lit(100L) - Relational.cents(col("l_discount")))).as("revenue_c4"))
    assert(df.count() > 0)
    assert(df.except(plain).isEmpty && plain.except(df).isEmpty)
  }
}
