package graft

import graft.operators.Par
import org.apache.spark.sql.functions._

/** The parallelism floor must widen small scans without planning the
  * physical query (it reads file stats from the analyzed plan). */
class ParSpec extends SparkSpec {

  test("small parquet scan is widened to the session's parallelism") {
    val df = Par.widen(spark.read.parquet(s"$Sf0001/documents.parquet"))
    assert(df.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("widen preserves rows and schema") {
    val base = spark.read.parquet(s"$Sf0001/documents.parquet")
    val w = Par.widen(base)
    assert(w.schema == base.schema)
    assert(w.count() == base.count())
  }

  test("non-file frames get the floor too (unknown size)") {
    import spark.implicits._
    val df = Par.widen(Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      .filter(col("doc_id") > 0))
    assert(df.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }
}
