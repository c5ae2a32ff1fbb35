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
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
