package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator coverage over the TPC-H-ish testdata:
  * aggregations, joins (broadcast/shuffle/semi/anti), windows,
  * rollup, set ops, top-k, scalar function library. The reference
  * has none of this (SURVEY.md §2.2) — these are the north-star
  * extensions, all Catalyst built-ins.
  *
  * Numeric determinism: money columns are exact 2-decimal doubles;
  * every SUM over them goes through integer cents
  * (round(x*100) as long) so results are partition-order-independent
  * and bit-identical to the DuckDB oracle. Pass-through doubles
  * (no arithmetic) are inherently safe.
  *
  * Scale notes: dimension tables (region/nation/supplier/customer)
  * are broadcast — at 100 TB lineitem never shuffles for these
  * joins; fact-fact joins (orders x lineitem) shuffle on the join
  * key, which AQE can re-balance.
  */
object Relational {

  def cents(c: Column): Column = round(c * 100, 0).cast("long")
  private def money(sumCents: Column): Column = sumCents.cast("double") / 100.0

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** TPC-H Q1 style pricing summary. disc/charge math in integer
    * basis points: price_cents * (100 - disc_pct) [* (100 + tax_pct)]
    * — exact, overflow-safe to ~sf100 on int64. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .filter(col("l_shipdate").cast("date") < lit("2000-01-01").cast("date"))
    val discPct = round(col("l_discount") * 100, 0).cast("long")
    val taxPct = round(col("l_tax") * 100, 0).cast("long")
    val priceC = cents(col("l_extendedprice"))
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(cents(col("l_quantity"))).as("qty_c"),
        sum(priceC).as("base_c"),
        sum(priceC * (lit(100L) - discPct)).as("disc_c4"),
        sum(priceC * (lit(100L) - discPct) * (lit(100L) + taxPct)).as("charge_c6"),
        sum(discPct).as("disc_pct_sum"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        money(col("qty_c")).as("sum_qty"),
        money(col("base_c")).as("sum_base_price"),
        (col("disc_c4").cast("double") / 10000.0).as("sum_disc_price"),
        (col("charge_c6").cast("double") / 1000000.0).as("sum_charge"),
        (col("qty_c").cast("double") / 100.0 / col("count_order").cast("double")).as("avg_qty"),
        (col("base_c").cast("double") / 100.0 / col("count_order").cast("double")).as("avg_price"),
        (col("disc_pct_sum").cast("double") / 100.0 / col("count_order").cast("double")).as("avg_disc"),
        col("count_order"))
  }

  /** TPC-H Q3 style: top-10 unshipped-revenue orders for one market
    * segment. customer is broadcast; orders x lineitem shuffles on
    * orderkey. Deterministic top-k via (revenue desc, orderkey). */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = table(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = table(spark, dir, "orders")
      .filter(col("o_orderdate").cast("date") < lit("1998-01-01").cast("date"))
    val li = table(spark, dir, "lineitem")
      .filter(col("l_shipdate").cast("date") >= lit("1998-01-01").cast("date"))
    val revC4 = cents(col("l_extendedprice")) * (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
      .agg(sum(revC4).as("rev_c4"))
      .select(col("l_orderkey"), (col("rev_c4").cast("double") / 10000.0).as("revenue"), col("o_orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 style: revenue per nation for one region; all
    * dimensions broadcast, single shuffle on orderkey. */
  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val region = table(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nation = table(spark, dir, "nation")
    val cust = table(spark, dir, "customer")
    val supp = table(spark, dir, "supplier")
    val ord = table(spark, dir, "orders")
    val li = table(spark, dir, "lineitem")
    val revC4 = cents(col("l_extendedprice")) * (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(revC4).as("rev_c4"))
      .select(col("n_name"), (col("rev_c4").cast("double") / 10000.0).as("revenue"))
  }

  /** Semi join (EXISTS): order-priority counts for orders having at
    * least one returned lineitem. */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = table(spark, dir, "orders")
    val returned = table(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R").select("l_orderkey")
    ord.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  /** Anti join: customers with no URGENT orders, per segment. */
  def q22NoOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = table(spark, dir, "customer")
    val ord = table(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        sum(cents(col("c_acctbal"))).as("bal_c"))
      .select(col("c_mktsegment"), col("n_customers"),
        money(col("bal_c")).as("sum_acctbal"))
  }

  /** TPC-H Q6 style: forecast-revenue-change scalar — pure scan +
    * filter + global agg, the canonical predicate-pushdown probe (all
    * three filters reach the parquet scan; no shuffle but the final
    * single-partition agg of partials). */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    val discPct = round(col("l_discount") * 100, 0).cast("long")
    table(spark, dir, "lineitem")
      .filter(col("l_shipdate").cast("date") >= lit("1997-01-01").cast("date") &&
        col("l_shipdate").cast("date") < lit("1998-01-01").cast("date") &&
        col("l_quantity") < 24)
      .filter(discPct >= 5 && discPct <= 7)
      .agg(sum(cents(col("l_extendedprice")) * discPct).as("rev_c4"),
        count(lit(1)).as("n_items"))
      .select((col("rev_c4").cast("double") / 10000.0).as("revenue"), col("n_items"))
  }

  /** TPC-H Q10 style: top-20 customers by revenue lost to returns.
    * lineitem('R') x orders shuffle on orderkey; customer broadcast;
    * deterministic top-k. */
  def q10ReturnedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
    val ord = table(spark, dir, "orders")
    val cust = table(spark, dir, "customer")
    val revC4 = cents(col("l_extendedprice")) *
      (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name", "c_mktsegment")
      .agg(sum(revC4).as("rev_c4"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        (col("rev_c4").cast("double") / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q14 style: promo revenue share for one ship-month —
    * conditional aggregation over a broadcast dimension join, ratio
    * of two exact integer sums. */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .filter(col("l_shipdate").cast("date") >= lit("1997-09-01").cast("date") &&
        col("l_shipdate").cast("date") < lit("1997-10-01").cast("date"))
    val part = table(spark, dir, "part")
    val revC4 = cents(col("l_extendedprice")) *
      (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", revC4).otherwise(lit(0L))).as("promo_c4"),
        sum(revC4).as("total_c4"))
      .select(
        (lit(100.0) * col("promo_c4").cast("double") / col("total_c4").cast("double"))
          .as("promo_share_pct"),
        (col("promo_c4").cast("double") / 10000.0).as("promo_revenue"),
        (col("total_c4").cast("double") / 10000.0).as("total_revenue"))
  }

  /** TPC-H Q17 style: revenue from small-quantity lineitems, where
    * "small" = below 20% of the part's average quantity. The
    * per-part average is a self-aggregation joined back to the fact
    * stream; the comparison qty·5·n < sum stays in exact int64 (no
    * division). */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(cents(col("l_quantity"))).as("sum_qty_c"), count(lit(1)).as("n_li"))
    li.join(perPart, col("l_partkey") === col("pk"))
      // l_quantity < 0.2 * avg  ⇔  qty_c * 5 * n < sum_qty_c (exact)
      .filter(cents(col("l_quantity")) * 5 * col("n_li") < col("sum_qty_c"))
      .agg(sum(cents(col("l_extendedprice"))).as("rev_c"), count(lit(1)).as("n_small"))
      .select(money(col("rev_c")).as("small_qty_revenue"), col("n_small"))
  }

  /** TPC-H Q18 style: large orders (lineitem quantity sum > 250) with
    * their customers — a HAVING on a fact self-aggregation joined
    * back to two dimensions; deterministic order, no limit (the
    * qualifying set is already selective). */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = table(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(cents(col("l_quantity"))).as("qty_c"))
      .filter(col("qty_c") > 250 * 100)
    val ord = table(spark, dir, "orders")
    val cust = table(spark, dir, "customer")
    big.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_totalprice"), money(col("qty_c")).as("total_qty"))
  }

  /** Window ranking: top-3 orders per customer by totalprice. */
  def windowTopOrders(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    table(spark, dir, "orders")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select("o_custkey", "o_orderkey", "rnk", "o_totalprice")
  }

  /** Window running total per customer over order date (ROWS frame
    * with full tiebreak ordering for determinism). */
  def windowRunningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, 0)
    table(spark, dir, "orders")
      .withColumn("running_c", sum(cents(col("o_totalprice"))).over(w))
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        money(col("running_c")).as("running_total"))
  }

  /** ROLLUP over (year, month) of order totals. */
  def rollupSales(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"),
        cents(col("o_totalprice")).as("c"))
      .rollup("y", "m")
      .agg(count(lit(1)).as("n_orders"), sum(col("c")).as("sum_c"))
      .select(coalesce(col("y"), lit(-1)).as("y"),
        coalesce(col("m"), lit(-1)).as("m"),
        col("n_orders"), money(col("sum_c")).as("total_sales"))

  /** Deterministic global top-k with tiebreak. */
  def topKOrders(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  /** Set operations: nation keys with customers INTERSECT/EXCEPT
    * nation keys with suppliers, tagged and unioned. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val cn = table(spark, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
    val sn = table(spark, dir, "supplier").select(col("s_nationkey").as("nationkey")).distinct()
    cn.intersect(sn).withColumn("tag", lit("both"))
      .union(cn.except(sn).withColumn("tag", lit("customer_only")))
      .select("tag", "nationkey")
  }

  /** Scalar function library exercise over part (string, math,
    * conditional). */
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part").select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_upper"),
      lower(col("p_type")).as("type_lower"),
      substring(col("p_name"), 1, 5).as("name_prefix"),
      concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
      length(col("p_name")).cast("long").as("name_len"),
      (col("p_size") % 7).as("size_mod7"),
      abs(col("p_size") - 25).as("size_dev"),
      sqrt(col("p_size").cast("double")).as("size_sqrt"),
      floor(col("p_retailprice")).cast("long").as("price_floor"),
      when(col("p_size") > 25, "large").otherwise("small").as("size_class"))

  /** CUBE over (year, status): all grouping-set combinations. */
  def cubeSales(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select(year(col("o_orderdate")).as("y"), col("o_orderstatus"),
        cents(col("o_totalprice")).as("c"))
      .cube("y", "o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), sum(col("c")).as("sum_c"))
      .select(coalesce(col("y"), lit(-1)).as("y"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        col("n_orders"), money(col("sum_c")).as("total_sales"))

  /** Deterministic manual median (no engine-specific percentile
    * interpolation): the middle one or two cents values per group,
    * picked by row_number with a full tiebreak, then averaged.
    * Group sizes come from a pre-aggregated broadcast join, NOT a
    * second unbounded window pass (count().over(partitionBy) buffers
    * every row per group a second time — measured ~2x the query). */
  def medianByStatus(spark: SparkSession, dir: String): DataFrame = {
    val ord = table(spark, dir, "orders")
      .select(col("o_orderstatus"), col("o_orderkey"), cents(col("o_totalprice")).as("c"))
    val cnts = ord.groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("o_orderstatus").orderBy(col("c"), col("o_orderkey"))
    ord.join(broadcast(cnts), Seq("o_orderstatus"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === expr("(cnt + 1) div 2") || col("rn") === expr("(cnt + 2) div 2"))
      .groupBy("o_orderstatus")
      .agg(sum(col("c")).as("mid_sum"), count(lit(1)).as("mid_n"))
      .select(col("o_orderstatus"),
        (col("mid_sum").cast("double") / col("mid_n").cast("double") / 100.0).as("median_price"))
  }

  /** HLL++ sketch vs exact distinct counts per return flag — the
    * approximate path for 100 TB cardinality estimation (rows-only
    * check: the sketch is engine-specific by nature).
    *
    * Shape: multiple countDistincts in ONE agg make Catalyst Expand
    * the input N-fold before the shuffle (600k -> 2.4M rows here); a
    * distinct-then-count per column plus a single-pass HLL agg, joined
    * on the 3-row key, scans thrice but never expands — measured ~2x
    * faster, and the gap widens with input size. */
  /** Exact + raw-HLL distinct counts per group — internal currency
    * for [[approxDistinct]] (the oracle-checked public shape) and
    * [[sketchErrorGate]]. The raw approx_* values are engine-specific
    * (DuckDB cannot replay Spark's HLL registers), which is why the
    * public query derives bits from them instead of emitting them. */
  private def approxDistinctFull(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .select("l_returnflag", "l_partkey", "l_suppkey")
    val exactParts = li.select("l_returnflag", "l_partkey").distinct()
      .groupBy("l_returnflag").agg(count(lit(1)).as("exact_parts"))
    val exactSupps = li.select("l_returnflag", "l_suppkey").distinct()
      .groupBy("l_returnflag").agg(count(lit(1)).as("exact_supps"))
    val approx = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        approx_count_distinct(col("l_suppkey"), 0.02).as("approx_supps"))
    exactParts.join(exactSupps, Seq("l_returnflag")).join(approx, Seq("l_returnflag"))
      .select("l_returnflag", "exact_parts", "approx_parts", "exact_supps", "approx_supps")
  }

  /** HLL distinct-count query, fully hash-checkable (r6 verdict item
    * 7): the exact distinct counts ride next to one within-bound bit
    * per sketched column — the estimate itself stays engine-internal,
    * the exactness AND the sketch-health claim are both replayed by
    * the oracle. A sketch regression (wrong register math, precision
    * change) flips a bit and fails the hash, same contract the
    * standalone sketch_error_gate pins at the gate altitude. */
  /** EXPLICIT runtime-bloom semi-join pushdown — the row-level analog
    * of dynamic partition pruning for non-partition join keys, made
    * deterministic: Catalyst's InjectRuntimeFilter does exactly this
    * shape behind size thresholds; building it explicitly keeps every
    * other query's plan untouched and pins the demonstration.
    *
    * A selective dim filter (part rows of one size, ~2% of the dim) would still
    * force the fact side to shuffle ALL lineitem rows into the join.
    * Instead: (1) fold the filtered dim keys into a ~1 MB bloom
    * filter (one-row aggregate, the only driver-side datum); (2)
    * prefilter the fact scan with bloom_might_contain BEFORE the
    * exchange, so ~99% of fact rows never shuffle; (3) run the real
    * join for exactness — a bloom filter has no false NEGATIVES, so
    * the prefilter can only pass extra rows the join then drops, and
    * the result is bit-identical to the plain join (the oracle
    * replays plain SQL). At 100 TB the 1 MB filter rides the task
    * broadcast; the savings is the fact-side exchange. */
  def bloomPrunedJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.graft.Bridge
    val dim = table(spark, dir, "part")
      .filter(col("p_size") === 1)
      .select(col("p_partkey"), col("p_brand"))
    val bloomAgg = Bridge.column(
      new BloomFilterAggregate(new XxHash64(
        Seq(Bridge.expression(col("p_partkey"))))).toAggregateExpression())
    val filterBytes = dim.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    val might = Bridge.column(BloomFilterMightContain(
      Literal.create(filterBytes, org.apache.spark.sql.types.BinaryType),
      new XxHash64(Seq(Bridge.expression(col("l_partkey"))))))
    val li = table(spark, dir, "lineitem")
      .select(col("l_partkey"),
        (cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .as("rev_c4"))
      .filter(might) // fact rows die at the scan, before any exchange
    li.hint("merge").join(dim, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"), sum(col("rev_c4")).as("revenue_c4"))
  }

  def approxDistinct(spark: SparkSession, dir: String): DataFrame = {
    def within(approx: String, exact: String) =
      when(abs(col(approx) - col(exact)) * 100 <= col(exact) * SketchMaxErrPct, 1L)
        .otherwise(0L)
    approxDistinctFull(spark, dir)
      .select(col("l_returnflag"), col("exact_parts"), col("exact_supps"),
        within("approx_parts", "exact_parts").as("parts_within"),
        within("approx_supps", "exact_supps").as("supps_within"))
  }

  /** HLL error-bound floor for [[sketchErrorGate]]: approx_count_
    * distinct runs at rsd 0.02; 5% tolerates ~2.5 sigma, so a healthy
    * sketch never trips the gate while a broken one (wrong register
    * math, precision regression) flips a bit and fails the oracle
    * hash. */
  val SketchMaxErrPct: Int = 5

  /** Bit-checked QUALITY gate for the HLL sketch (the ann_recall
    * pattern): per group, 1 iff |approx - exact| <= SketchMaxErrPct%
    * of exact, for both sketched columns. The sketch VALUES are
    * engine-specific (rows-only q:approx_distinct); the error-bound
    * claim is a bit the oracle replays. Integer comparison:
    * |a-e|*100 <= e*pct — no float boundary. */
  def sketchErrorGate(spark: SparkSession, dir: String): DataFrame = {
    val a = approxDistinctFull(spark, dir)
    def within(approx: String, exact: String) =
      when(abs(col(approx) - col(exact)) * 100 <= col(exact) * SketchMaxErrPct, 1L)
        .otherwise(0L)
    a.select(col("l_returnflag"),
      lit(SketchMaxErrPct.toLong).as("max_err_pct"),
      within("approx_parts", "exact_parts").as("parts_within"),
      within("approx_supps", "exact_supps").as("supps_within"))
  }

  /** Quantile-sketch QUALITY gate — the sketch_error_gate pattern for
    * the other workhorse sketch: approx_percentile's contract is that
    * the returned value's exact-rank interval intersects
    * [q·n − n/acc, q·n + n/acc]. The sketch VALUE is partition-order
    * sensitive (mergeable summaries), but the CONTRACT is
    * deterministic, so the gate recomputes each approx value's true
    * rank interval and emits one oracle-replayable bit per quantile.
    * At 100 TB the sketch is the only viable percentile (exact needs
    * a global sort); this gate is what lets a pipeline trust it.
    * Integer arithmetic throughout (ranks ×10000 vs q in basis
    * points). The two driver-side head() calls fetch one bounded
    * aggregate row each (the AnnRecall precedent), never data. */
  def quantileErrorGate(spark: SparkSession, dir: String,
                        accuracy: Int = 1000): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .select(cents(col("l_extendedprice")).as("price_c"))
    val qbps = Seq(5000L, 9000L, 9900L)
    val first = li.agg(
      expr(s"approx_percentile(price_c, array(0.5, 0.9, 0.99), $accuracy)")
        .as("vs"),
      count(lit(1)).as("n")).head()
    val vs = first.getSeq[Long](0)
    val n = first.getLong(1)
    val rankCols = qbps.indices.flatMap { i =>
      Seq(sum(when(col("price_c") <= vs(i), 1L).otherwise(0L)).as(s"le_$i"),
        sum(when(col("price_c") < vs(i), 1L).otherwise(0L)).as(s"lt_$i"))
    }
    val counts = li.agg(rankCols.head, rankCols.tail: _*).head()
    val slack = n * 10000L / accuracy
    import spark.implicits._
    qbps.zipWithIndex.map { case (qbp, i) =>
      val le = counts.getLong(2 * i)
      val lt = counts.getLong(2 * i + 1)
      val ok = le * 10000L >= qbp * n - slack &&
        (lt + 1) * 10000L <= qbp * n + slack
      (qbp, if (ok) 1L else 0L)
    }.toDF("quantile_bp", "within")
  }

  /** Skew-resilient join surfaced as a query: lineitem x orders via
    * the salted equi-join (hot orderkeys scatter across saltFactor
    * reducer partitions), aggregated to revenue per status. The
    * oracle is the PLAIN join+agg — salting must be semantically
    * invisible. */
  def saltedJoinSales(spark: SparkSession, dir: String): DataFrame = {
    // salt from (orderkey, linenumber) — row-unique, so a hot
    // orderkey's lines scatter across all saltFactor partitions
    // (salting by the join key alone would keep them together)
    val li = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        cents(col("l_extendedprice")).as("price_c"))
    val ord = table(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    Salting.saltedEquiJoin(li, ord, "l_orderkey",
        xxhash64(col("l_orderkey"), col("l_linenumber")))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_items"), sum(col("price_c")).as("sum_c"))
      .select(col("o_orderstatus"), col("n_items"),
        money(col("sum_c")).as("total_price"))
  }

  /** Planted-skew join fixture: 99% of lineitem rows collapse onto
    * ONE join key (the remainder spread over 1..999), joined to a
    * derived 1000-key dimension with 8× row multiplicity, `merge`
    * hint on the dim so the join SHUFFLES (broadcast would hide the
    * skew the fixture exists to demonstrate, and AQE's skew split
    * does not trigger below its 256 MB partition threshold at this
    * sf). The [[skewJoinUnsalted]] plan puts ~99% of the join+agg in
    * one reducer task; [[skewJoinSalted]] scatters the hot key across
    * saltFactor salts. Identical results (one oracle) — the benched
    * pair quantifies the salting guard's win on real skew. */
  private def skewSides(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val li = table(spark, dir, "lineitem")
      .select(
        when(pmod(col("l_orderkey"), lit(100)) < 99, 0L)
          .otherwise(pmod(col("l_orderkey"), lit(1000))).as("hk"),
        col("l_orderkey"), col("l_linenumber"),
        cents(col("l_extendedprice")).as("price_c"))
    val dim = spark.range(0, 1000)
      .select(col("id").as("hk"),
        explode(sequence(lit(0L), lit(127L))).as("rep"))
    (li, dim)
  }

  private def skewAgg(joined: DataFrame): DataFrame =
    joined
      .groupBy(pmod(col("hk") + col("rep"), lit(7)).as("grp"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("price_c") * (col("rep") + 1)).as("sum_c"))
      .select(col("grp"), col("n_rows"), money(col("sum_c")).as("total"))

  /** The skew fixture WITHOUT the guard: plain shuffle equi-join, one
    * hot reducer. Kept registered (and benched) as the baseline the
    * salted form is measured against. */
  def skewJoinUnsalted(spark: SparkSession, dir: String): DataFrame = {
    val (li, dim) = skewSides(spark, dir)
    skewAgg(li.join(dim.hint("merge"), Seq("hk")))
  }

  /** The skew fixture WITH the salting guard: the hot key's rows
    * scatter across 8 salts (row-unique salt source), the dim
    * explodes 8×, and no reducer owns more than ~1/8 of the hot key. */
  def skewJoinSalted(spark: SparkSession, dir: String): DataFrame = {
    val (li, dim) = skewSides(spark, dir)
    skewAgg(Salting.saltedEquiJoin(li, dim.hint("merge"), "hk",
      xxhash64(col("l_orderkey"), col("l_linenumber"))))
  }

  /** Window-function variety beyond ranking/frames: lag/lead offsets,
    * ntile bucketing, dense_rank — all over fully-tiebroken orderings
    * so every function's output is deterministic. */
  def windowLagLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val wYear = Window.partitionBy("o_custkey").orderBy(year(col("o_orderdate")))
    table(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        cents(col("o_totalprice")).as("c"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        money(col("c")).as("price"),
        money(lag(col("c"), 1).over(w)).as("prev_price"),
        lead(col("o_orderdate"), 1).over(w).as("next_orderdate"),
        ntile(4).over(w).cast("long").as("quartile"),
        dense_rank().over(wYear).cast("long").as("year_rank"))
  }

  /** String function-library coverage over part: padding, replace,
    * search, slicing, predicates — engine-portable semantics only
    * (1-based strpos, boolean predicates cast to int). */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part")
      .select(col("p_partkey"),
        lpad(col("p_brand"), 12, "*").as("brand_lpad"),
        rpad(col("p_brand"), 12, "-").as("brand_rpad"),
        regexp_replace(col("p_type"), "O", "0").as("type_zeroed"),
        instr(col("p_name"), "a").cast("long").as("first_a"),
        repeat(col("p_brand"), 2).as("brand_twice"),
        reverse(col("p_name")).as("name_rev"),
        substring(col("p_name"), 1, 3).as("name_left3"),
        element_at(split(col("p_brand"), "#"), 2).as("brand_num"),
        translate(col("p_type"), "AEO", "aeo").as("type_translated"),
        col("p_name").contains("or").cast("int").as("has_or"),
        col("p_type").startsWith("S").cast("int").as("starts_s"),
        col("p_name").endsWith("e").cast("int").as("ends_e"))

  /** Date/time function coverage over orders: component extraction,
    * arithmetic, truncation, formatting — every output cast to
    * int/string so cross-engine representation is exact. */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame = {
    val d = col("o_orderdate").cast("date")
    table(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        year(d).cast("long").as("y"),
        month(d).cast("long").as("m"),
        dayofmonth(d).cast("long").as("dom"),
        dayofyear(d).cast("long").as("doy"),
        quarter(d).cast("long").as("q"),
        datediff(lit("1999-01-01").cast("date"), d).cast("long").as("days_to_1999"),
        date_format(date_add(d, 30), "yyyy-MM-dd").as("plus_30d"),
        date_format(trunc(d, "MM"), "yyyy-MM-dd").as("month_start"),
        date_format(last_day(d), "yyyy-MM-dd").as("month_end"))
  }

  /** PIVOT: order counts and exact-cents sales per (year x status),
    * statuses as explicit pivot columns (never inferred — inference
    * would be a driver-side distinct scan at 100 TB). */
  def pivotSales(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select(year(col("o_orderdate")).cast("long").as("y"),
        col("o_orderstatus"), cents(col("o_totalprice")).as("c"))
      .groupBy("y")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(col("c")))
      .select(col("y"),
        money(coalesce(col("F"), lit(0L))).as("sales_f"),
        money(coalesce(col("O"), lit(0L))).as("sales_o"),
        money(coalesce(col("P"), lit(0L))).as("sales_p"))

  /** Explicit GROUPING SETS (finer than rollup/cube): per-year,
    * per-status, and grand total in one pass. */
  def groupingSetsSales(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select(year(col("o_orderdate")).cast("long").as("y"),
        col("o_orderstatus"), cents(col("o_totalprice")).as("c"))
      .groupingSets(Seq(Seq(col("y")), Seq(col("o_orderstatus")), Seq()),
        col("y"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), sum(col("c")).as("sum_c"))
      .select(coalesce(col("y"), lit(-1L)).as("y"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        col("n_orders"), money(col("sum_c")).as("total_sales"))

  private def revC4: Column = cents(col("l_extendedprice")) *
    (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))

  /** TPC-H Q7 style: shipping volume between two nations by year —
    * two independent dimension chains (supplier-side and
    * customer-side nation) hang off the fact stream as broadcasts;
    * the only shuffle is lineitem x orders on orderkey. */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val n1 = table(spark, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = table(spark, dir, "nation")
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val li = table(spark, dir, "lineitem")
      .filter(col("l_shipdate").cast("date") >= lit("1996-01-01").cast("date") &&
        col("l_shipdate").cast("date") < lit("1998-01-01").cast("date"))
    li.join(table(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(table(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(table(spark, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(revC4).as("rev_c4"))
      .select(col("supp_nation"), col("cust_nation"), col("l_year"),
        (col("rev_c4").cast("double") / 10000.0).as("revenue"))
  }

  /** TPC-H Q8 style: one nation's market share of ECONOMY-part
    * revenue inside one customer region, by order year — the share
    * is a ratio of two exact integer sums built by conditional
    * aggregation in a single pass. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val nat = table(spark, dir, "nation")
    val custRegion = table(spark, dir, "customer")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(table(spark, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val suppNation = table(spark, dir, "supplier")
      .join(broadcast(nat.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("s_nk"))
      .select("s_suppkey", "supp_nation")
    table(spark, dir, "lineitem")
      .join(broadcast(table(spark, dir, "part").filter(col("p_type") === "ECONOMY")),
        col("l_partkey") === col("p_partkey"))
      .join(table(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custRegion), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(when(col("supp_nation") === "NATION_3", revC4).otherwise(lit(0L))).as("nation_c4"),
        sum(revC4).as("total_c4"))
      .select(col("o_year"),
        (col("nation_c4").cast("double") / col("total_c4").cast("double")).as("mkt_share"),
        (col("total_c4").cast("double") / 10000.0).as("total_revenue"))
  }

  /** TPC-H Q9 style (adapted: no partsupp/supplycost in the schema):
    * margin vs retail = extprice·(1−disc) − qty·retailprice, per
    * supplier nation and order year, for parts named like '%gear%'.
    * Both terms live in the same 10^-4-dollar integer scale, so the
    * subtraction is exact. */
  def q9ProfitByNation(spark: SparkSession, dir: String): DataFrame = {
    val part = table(spark, dir, "part").filter(col("p_name").contains("gear"))
      .select(col("p_partkey"), cents(col("p_retailprice")).as("retail_c"))
    val suppNation = table(spark, dir, "supplier")
      .join(broadcast(table(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    table(spark, dir, "lineitem")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(table(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(revC4 - cents(col("l_quantity")) * col("retail_c")).as("profit_c4"),
        count(lit(1)).as("n_items"))
      .select(col("nation"), col("o_year"),
        (col("profit_c4").cast("double") / 10000.0).as("margin"), col("n_items"))
  }

  /** TPC-H Q13 style: distribution of per-customer order counts
    * (excluding URGENT orders) — the canonical LEFT OUTER join +
    * double aggregation; customers with zero orders land in the
    * c_count=0 bucket. */
  def q13OrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val ord = table(spark, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey", "o_orderkey")
    table(spark, dir, "customer")
      .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .select("c_count", "custdist")
  }

  /** TPC-H Q15 style: the top supplier(s) by revenue over one
    * quarter. The global max is a 1-row broadcast joined back —
    * never a driver-side collect, and ties all surface. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = table(spark, dir, "lineitem")
      .filter(col("l_shipdate").cast("date") >= lit("1996-01-01").cast("date") &&
        col("l_shipdate").cast("date") < lit("1996-04-01").cast("date"))
      .groupBy(col("l_suppkey"))
      .agg(sum(revC4).as("rev_c4"))
    val mx = rev.agg(max(col("rev_c4")).as("mx"))
    rev.join(broadcast(mx), col("rev_c4") === col("mx"))
      .join(broadcast(table(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_suppkey").as("s_suppkey"), col("s_name"),
        (col("rev_c4").cast("double") / 10000.0).as("total_revenue"))
  }

  /** TPC-H Q16 style (adapted: no partsupp): distinct suppliers
    * shipping each (brand, type, size) combo for a size whitelist,
    * excluding one brand and PROMO parts. countDistinct after a
    * broadcast dimension join. */
  def q16SupplierCounts(spark: SparkSession, dir: String): DataFrame = {
    val part = table(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    table(spark, dir, "lineitem").select("l_partkey", "l_suppkey")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .select(col("p_brand"), col("p_type"), col("p_size").cast("long").as("p_size"),
        col("supplier_cnt"))
  }

  /** TPC-H Q19 style: disjunctive brand/size/quantity predicate —
    * three OR'd branches that Catalyst keeps as one post-join filter
    * with the common partkey equi-join underneath (no union of three
    * scans). */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val part = table(spark, dir, "part")
    val branch1 = col("p_brand") === "Brand#2" && col("p_size").between(1, 5) &&
      col("l_quantity").between(1, 11)
    val branch2 = col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
      col("l_quantity").between(10, 20)
    val branch3 = col("p_brand") === "Brand#24" && col("p_size").between(1, 15) &&
      col("l_quantity").between(20, 30)
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(branch1 || branch2 || branch3)
      .agg(sum(revC4).as("rev_c4"), count(lit(1)).as("n_items"))
      .select((col("rev_c4").cast("double") / 10000.0).as("revenue"), col("n_items"))
  }

  /** TPC-H Q21 style (adapted: no commit/receipt dates): suppliers
    * whose returned item is the ONLY return in a multi-supplier
    * order. The EXISTS / NOT-EXISTS pair collapses into per-order
    * set algebra — ONE scan of lineitem, one shuffle on orderkey
    * collecting the distinct supplier set and the distinct returned-
    * supplier set (both tiny: suppliers per order), then a supplier-
    * level count. The textbook semi+anti formulation would scan the
    * fact table three times and (at scale) shuffle it twice more. */
  def q21SoleReturns(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(collect_set(col("l_suppkey")).as("supps"),
        collect_set(when(col("l_returnflag") === "R", col("l_suppkey"))).as("ret_supps"))
      .filter(size(col("supps")) >= 2 && size(col("ret_supps")) === 1)
      .select(element_at(col("ret_supps"), 1).as("l_suppkey"))
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(table(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(20)
  }

  /** TPC-H Q2 style (adapted: no partsupp/supplycost — "cost" is
    * the minimum extended price a supplier ever shipped the part
    * at): for gear parts in a size whitelist, the ASIA supplier(s)
    * achieving the part's minimum price. Per-group min join-back via
    * an unpartitioned-free window over p_partkey (one shuffle on the
    * aggregated (part, supplier) frame; ties all surface). */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val part = table(spark, dir, "part")
      .filter(col("p_name").contains("gear") && col("p_size").isin(5, 15, 25, 35, 45))
      .select("p_partkey", "p_name")
    val suppAsia = table(spark, dir, "supplier")
      .join(broadcast(table(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(table(spark, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name").as("nation"))
    val perPartSupp = table(spark, dir, "lineitem")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppAsia), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("s_suppkey"),
        col("s_name"), col("nation"))
      .agg(min(cents(col("l_extendedprice"))).as("min_price_c"))
    val w = Window.partitionBy("p_partkey")
    perPartSupp
      .withColumn("part_min_c", min(col("min_price_c")).over(w))
      .filter(col("min_price_c") === col("part_min_c"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
        col("nation"), money(col("min_price_c")).as("min_price"))
  }

  /** TPC-H Q11 style (adapted: revenue share instead of stock
    * value): suppliers contributing more than 0.1% of total revenue.
    * The global total is a 1-ROW broadcast crossed into the
    * per-supplier frame (a nested-loop join whose inner side is one
    * row by construction — bounded, see PlanAuditSpec), and the
    * share test is exact integer (rev > total div 1000) — no float
    * ratio anywhere. */
  def q11ImportantSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val rev = table(spark, dir, "lineitem")
      .groupBy("l_suppkey")
      .agg(sum(revC4).as("rev_c4"))
    val total = rev.agg(sum(col("rev_c4")).as("total_c4"))
    rev.crossJoin(broadcast(total))
      .filter(col("rev_c4") > expr("total_c4 div 1000"))
      .join(broadcast(table(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_c4").cast("double") / 10000.0).as("revenue"))
  }

  /** TPC-H Q20 style (adapted: no partsupp/availqty — "excess"
    * relative to expectation): suppliers who shipped MORE THAN TWICE
    * their fair share of some part's total quantity (fair share =
    * total / #suppliers of the part). Per-part shares via one window
    * over the aggregated (part, supplier) frame; the comparison is
    * exact integer cross-multiplication (qty·n > 2·total), never a
    * float ratio. */
  def q20DominantSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val perPartSupp = table(spark, dir, "lineitem")
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(cents(col("l_quantity"))).as("qty_c"))
    val w = Window.partitionBy("l_partkey")
    perPartSupp
      .withColumn("total_c", sum(col("qty_c")).over(w))
      .withColumn("n_supp", count(lit(1)).over(w))
      .filter(col("qty_c") * col("n_supp") > col("total_c") * 2)
      .select("l_suppkey").distinct()
      .join(broadcast(table(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"))
  }

  /** TPC-H Q12 style (adapted: no l_shipmode/commitdate — "late"
    * means shipped more than 90 days after the order date): per ship
    * year, line counts split by order priority class. The only
    * shuffle is the lineitem x orders fact-fact join on orderkey;
    * the conditional counts are one-pass map-side partial sums. */
  def q12LateShipping(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem").select("l_orderkey", "l_shipdate")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    table(spark, dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate").cast("date") > date_add(col("o_orderdate").cast("date"), 90))
      .groupBy(year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
      .select("l_year", "high_line_count", "low_line_count")
  }

  /** Statistical moments per return flag, cross-engine exact: the
    * aggregation collects only integer sums (quantity cents,
    * discount percent, their squares and cross product — overflow-
    * safe to ~sf1000 on int64 since |q_c| ≤ 5000, |d_pct| ≤ 10),
    * then mean / sample variance / stddev / correlation are derived
    * in double arithmetic with one fixed expression shape, so Spark
    * and the oracle produce bit-identical IEEE doubles without any
    * order-dependent float accumulation. */
  def statsMoments(spark: SparkSession, dir: String): DataFrame = {
    val q = cents(col("l_quantity"))
    val d = round(col("l_discount") * 100, 0).cast("long")
    val dbl = (c: String) => col(c).cast("double")
    table(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(q).as("sq"), sum(q * q).as("sqq"),
        sum(d).as("sd"), sum(d * d).as("sdd"), sum(q * d).as("sqd"))
      .select(col("l_returnflag"), col("n"),
        (dbl("sq") / 100.0 / dbl("n")).as("mean_qty"),
        ((dbl("n") * dbl("sqq") - dbl("sq") * dbl("sq")) /
          (dbl("n") * (dbl("n") - 1.0)) / 10000.0).as("var_qty"),
        sqrt((dbl("n") * dbl("sqq") - dbl("sq") * dbl("sq")) /
          (dbl("n") * (dbl("n") - 1.0)) / 10000.0).as("std_qty"),
        ((dbl("n") * dbl("sqd") - dbl("sq") * dbl("sd")) /
          sqrt((dbl("n") * dbl("sqq") - dbl("sq") * dbl("sq")) *
            (dbl("n") * dbl("sdd") - dbl("sd") * dbl("sd")))).as("corr_qty_disc"))
  }

  /** Distinct aggregates per order status. */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(year(col("o_orderdate"))).as("n_years"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
}
