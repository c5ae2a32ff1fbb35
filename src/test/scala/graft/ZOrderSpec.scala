package graft

import org.apache.spark.sql.functions._
import graft.sources.ZOrder

class ZOrderSpec extends SparkSpec {

  test("spread16/zValue: interleave is exact on the bit level") {
    import spark.implicits._
    val samples = Seq(0L, 1L, 2L, 3L, 255L, 256L, 65535L, 12345L)
    val df = samples.map(x => (x, x / 3)).toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b")).as("z"))
    df.collect().foreach { r =>
      val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val model = (0 until 16).map { i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
      assert(z == model, s"zValue($a, $b) = $z, expected $model")
    }
  }

  test("z-ordered layout prunes row groups on BOTH box dims; linear only on one") {
    import spark.implicits._
    // deterministic pseudo-uniform 2-d points, enough rows for ~100
    // small row groups (pruning needs granularity to be observable)
    val n = 200000
    val pts = spark.range(n.toLong).select(
      (col("id") * 2654435761L % 65536L).as("x"),
      (col("id") * 40503L % 65536L).as("y"))
    val root = java.nio.file.Files.createTempDirectory("graft_zorder_spec").toString
    def write(df: org.apache.spark.sql.DataFrame, sortCol: org.apache.spark.sql.Column, path: String): Unit =
      df.withColumn("zv", sortCol).repartitionByRange(4, col("zv"))
        .sortWithinPartitions("zv").drop("zv")
        .write.option("parquet.block.size", 8 * 1024).parquet(path)
    write(pts, col("x"), s"$root/linear")
    write(pts, ZOrder.zValue(col("x"), col("y")), s"$root/zorder")

    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def scannedRows(path: String): (Long, Long) = {
        val df = spark.read.parquet(path)
          .filter(col("x") >= 10000 && col("x") < 16553 &&
            col("y") >= 30000 && col("y") < 36553)
        // collect() drives THIS QueryExecution (count() would plan a
        // separate query and leave these metrics untouched)
        val out = df.collect().length.toLong
        val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }.getOrElse(fail("no FileSourceScanExec leaf"))
        (scan.metrics("numOutputRows").value, out)
      }
      val (linScanned, linRows) = scannedRows(s"$root/linear")
      val (zScanned, zRows) = scannedRows(s"$root/zorder")
      assert(linRows == zRows, "layout must not change results")
      assert(zRows > 0, "box must select something")
      // the interleave's win: the z-ordered scan's row groups bound
      // both dims, so statistics skip most of what the linear layout
      // (clustered on x only) is forced to read
      assert(zScanned * 2 < linScanned,
        s"z-order scanned $zScanned rows, linear $linScanned — expected < half")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("layout twins agree with the raw-table box query at sf0.001") {
    val raw = spark.read.parquet(s"$Sf0001/events.parquet")
    val (maxU, maxE) = ZOrder.eventMaxes(spark, Sf0001)
    val expect = ZOrder.boxFilter(raw, maxU, maxE)
      .groupBy("event_type").agg(count(lit(1)).as("n_events"))
    val z = ZOrder.zorderBoxStats(spark, Sf0001).select("event_type", "n_events")
    val l = ZOrder.linearBoxStats(spark, Sf0001).select("event_type", "n_events")
    assert(z.except(expect).isEmpty && expect.except(z).isEmpty)
    assert(l.except(expect).isEmpty && expect.except(l).isEmpty)
  }
}
