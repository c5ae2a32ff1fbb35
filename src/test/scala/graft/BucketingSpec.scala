package graft

import java.nio.file.Files

/** Co-located joins via bucketing — the 100 TB technique for
  * repeated fact-fact joins: both tables bucketed on the join key →
  * the sort-merge join needs NO shuffle exchange at all. */
class BucketingSpec extends SparkSpec {

  test("bucketed orders x lineitem join plans without a shuffle exchange") {
    val s = spark
    val li = s.read.parquet(s"$Sf0001/lineitem.parquet")
    val ord = s.read.parquet(s"$Sf0001/orders.parquet")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")
    try {
      val joined = s.table("li_bucketed")
        .join(s.table("ord_bucketed"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // and it actually runs
      assert(joined.count() == li.count())
    } finally {
      s.sql("DROP TABLE IF EXISTS li_bucketed")
      s.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
