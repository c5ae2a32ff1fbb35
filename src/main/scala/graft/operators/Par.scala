package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism floor for narrow per-row pipelines.
  *
  * A small parquet table arrives as one or two scan splits (one ~5 MB
  * file = one partition), so every fused per-row stage downstream —
  * sketching, banding, hashing — runs nearly single-threaded no matter
  * how many cores the session has (measured: a 2x corpus repartitioned
  * to 32 ran the whole LSH chain FASTER than the 1x single-partition
  * scan). At 100 TB the scan already yields thousands of splits and
  * this is a no-op; the repartition only fires on inputs small enough
  * that shuffling them is free.
  */
object Par {
  private val DefaultSplitBytes = 128L * 1024 * 1024

  /** Estimated scan-split count, read from the ANALYZED plan's file
    * statistics — no physical planning, no RDD materialization (the
    * previous `df.rdd.getNumPartitions` planned the entire query just
    * to count partitions, once per registered-query construction). */
  private def estimatedSplits(df: DataFrame): Option[Long] = {
    val splitBytes =
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes"))
      catch { case _: Throwable => DefaultSplitBytes }
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        math.max(1L, (l.relation.sizeInBytes + splitBytes - 1) / splitBytes)
    }
  }

  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    estimatedSplits(df) match {
      case Some(n) if n >= target => df // big scan: already parallel
      case _ => df.repartition(target) // small or unknown: cheap floor
    }
  }
}
