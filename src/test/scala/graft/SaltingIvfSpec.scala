package graft

import org.apache.spark.sql.functions._
import graft.operators.{EmbeddingSim, Salting}

class SaltingIvfSpec extends SparkSpec {

  test("salted join equals plain join") {
    val s = spark
    import s.implicits._
    val big = (1L to 1000L).map(i => (i % 3, i)).toDF("k", "v")
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "name")
    val plain = big.join(small, "k").select("v", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Salting.saltedEquiJoin(big, small, "k", col("v"))
      .select("v", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
  }

  test("a hot key's rows scatter across multiple salts (row-varying salt source)") {
    val s = spark
    import s.implicits._
    // one key owns every row — the skew case salting exists for
    val big = (1L to 1000L).map(i => (42L, i)).toDF("k", "v")
    val salted = big.withColumn("_salt", pmod(xxhash64(col("v")), lit(8)).cast("int"))
    val distinctSalts = salted.select("_salt").distinct().count()
    assert(distinctSalts == 8L)
  }

  test("ivf topk returns ranked neighbors on real embeddings") {
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val out = EmbeddingSim.ivfTopK(emb, k = 3).collect()
    assert(out.nonEmpty)
    val perQuery = out.groupBy(_.getLong(0))
    assert(perQuery.values.forall(_.length <= 3))
    // ranks are 1..n and cosine is non-increasing within a query
    perQuery.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == (1L to sorted.length).toSeq)
      val cos = sorted.map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    // high recall vs brute force on the (vec_id % 100 == 0) queries
    val brute = EmbeddingSim.cosineTopK(emb, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfForQ = out.map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._1 % 100 == 0).toSet
    val recall = brute.intersect(ivfForQ).size.toDouble / brute.size
    assert(recall >= 0.5, s"ivf recall vs brute force too low: $recall")
  }
}
