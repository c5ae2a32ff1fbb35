package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.functions.PortableHash

/** The codegen PolyHash expression must be indistinguishable from
  * the built-ins HOF fold (and thus from the DuckDB oracle). */
class PolyHashSpec extends SparkSpec {

  private def both(strs: Seq[String]): (Seq[Long], Seq[Long]) = {
    val s = spark
    import s.implicits._
    val df = strs.toDF("t")
    val fast = df.select(PortableHash.charFoldHash(col("t"))).collect().map(_.getLong(0)).toSeq
    val ref = df.select(PortableHash.charFoldHashHof(col("t"))).collect().map(_.getLong(0)).toSeq
    (fast, ref)
  }

  test("codegen expression equals HOF fold on fixed + random ASCII strings") {
    val gen = Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
    val strs = Seq("", "a", "abc ", "x" * 500) ++
      Gen.listOfN(300, gen).apply(Gen.Parameters.default, org.scalacheck.rng.Seed(7L)).get
    val (fast, ref) = both(strs)
    assert(fast == ref)
  }

  test("codegen expression equals HOF fold on non-ASCII code points") {
    val strs = Seq("café", "日本語", "mixéd 😀 text")
    val (fast, ref) = both(strs)
    assert(fast == ref)
  }

  test("graft_polyhash is callable from SQL once registered") {
    // (the extensions config route only applies at session creation;
    // the shared test session already exists, so use the registry)
    org.apache.spark.sql.graft.Bridge.registerPolyHash(spark)
    val v = spark.sql("SELECT graft_polyhash('abc ') AS h").collect().head.getLong(0)
    val model = "abc ".foldLeft(0L)((a, c) => (a * 31 + c.toInt) % Config.P)
    assert(v == model)
  }

  test("GraftExtensions injects without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // builder wiring itself is exercised above
  }
}
