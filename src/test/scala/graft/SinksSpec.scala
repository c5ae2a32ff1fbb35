package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import graft.sources.{Sinks, Sources}

class SinksSpec extends SparkSpec {

  test("csv sink writes header, custom separator, and overwrites") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val df = docsDf(1L -> "hello", 2L -> "world")
    Sinks.writeCsvWithHeader(df, s"$dir/out")
    Sinks.writeCsvWithHeader(df, s"$dir/out") // overwrite must not throw
    val lines = Files.list(java.nio.file.Paths.get(s"$dir/out")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".csv"))
      .flatMap(p => Files.readAllLines(p).asScala).toSeq
    assert(lines.count(_ == "doc_id,text") >= 1) // header per part file
    assert(lines.contains("1,hello") && lines.contains("2,world"))
  }

  test("csv round trip preserves null, empty, newline, quote, and comma cells") {
    val dir = Files.createTempDirectory("graft-rt").toString
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "plain"),
      (2L, null.asInstanceOf[String]),
      (3L, ""),
      (4L, "line one\nline two"),
      (5L, "a \"quoted\" word, with comma"))
      .toDF("doc_id", "text")
    Sinks.writeCsvWithHeader(df, s"$dir/rt")
    val back = Sources.readCsv(spark, s"$dir/rt", df.schema).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(back(1L) == "plain")
    assert(back(2L) == null, "null must survive (not collapse to empty)")
    assert(back(3L) == "", "empty string must survive (not collapse to null)")
    assert(back(4L) == "line one\nline two", "embedded newline must survive")
    assert(back(5L) == "a \"quoted\" word, with comma")
  }

  test("reference-shaped artifacts land with reference headers") {
    val dir = Files.createTempDirectory("graft-ref").toString
    val docs = docsDf(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy dog")
    Sinks.writeReferenceArtifacts(docs, dir)
    def header(sub: String): String =
      Files.list(java.nio.file.Paths.get(s"$dir/$sub")).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".csv"))
        .flatMap(p => Files.readAllLines(p).asScala.headOption).next()
    assert(header("shingling") == "Shingling,rowsOffset")
    assert(header("pairs") == "Text1,Text2")
    assert(header("similar_scores") == "id_l,id_r,jaccard")
  }

  test("partitioned parquet sink lays out hive-style dirs and prunes on read") {
    val dir = Files.createTempDirectory("graft-part").toString
    val s = spark
    import s.implicits._
    val df = Seq((1L, "hello", "en"), (2L, "hola", "es"), (3L, "world", "en"))
      .toDF("doc_id", "text", "lang")
    Sinks.writePartitionedParquet(df, s"$dir/docs", Seq("lang"))
    val subdirs = Files.list(java.nio.file.Paths.get(s"$dir/docs")).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("lang=")).toSet
    assert(subdirs == Set("lang=en", "lang=es"))
    val back = spark.read.parquet(s"$dir/docs").filter($"lang" === "en")
    assert(back.collect().map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 3L))
    // partition pruning: the es directory is not in the scanned files
    val scanned = back.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(!scanned.contains("lang=es"))
  }

  test("text source reads raw lines with stable contiguous ids (O1 parity)") {
    val dir = Files.createTempDirectory("graft-src")
    val f = dir.resolve("corpus.txt")
    Files.write(f, java.util.Arrays.asList("first line", "second line", "third"))
    val out = Sources.readTextWithIds(spark, f.toString).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(out.toSeq == Seq((0L, "first line"), (1L, "second line"), (2L, "third")))
    val gappy = Sources.readTextWithIds(spark, f.toString, contiguous = false).collect()
    assert(gappy.map(_.getString(1)).toSet == Set("first line", "second line", "third"))
    assert(gappy.map(_.getLong(0)).distinct.length == 3)
  }

  test("jsonl source round-trips with explicit schema, no inference pass") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val df = docsDf(1L -> "alpha", 2L -> "beta")
    df.write.mode("overwrite").json(s"$dir/out")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val back = Sources.readJsonl(spark, s"$dir/out", schema).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == Map(1L -> "alpha", 2L -> "beta"))
  }

  test("jsonl source lands corrupt lines in _corrupt_record, keeps good rows") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-jsonl-corrupt")
    Files.writeString(dir.resolve("data.jsonl"),
      """{"doc_id": 1, "text": "good"}
        |this is not json at all
        |{"doc_id": 3, "text": "also good"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("_corrupt_record", StringType)))
    val rows = Sources.readJsonl(spark, dir.toString, schema)
      .collect().map(r => (Option(r.get(0)), Option(r.getString(2)))).toSet
    assert(rows == Set(
      (Some(1L), None), (Some(3L), None),
      (None, Some("this is not json at all"))))
  }

  test("orc sink/source round-trips with pushdown-friendly scan") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val df = docsDf(1L -> "alpha", 2L -> "beta", 3L -> "gamma")
    Sinks.writeOrc(df, s"$dir/out")
    val back = Sources.readOrc(spark, s"$dir/out")
    val filtered = back.filter(org.apache.spark.sql.functions.col("doc_id") > 1L)
    // the filter reaches the ORC scan (columnar pushdown parity with parquet)
    assert(filtered.queryExecution.executedPlan.toString.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,1)]"))
    assert(filtered.collect().map(_.getString(1)).toSet == Set("beta", "gamma"))
  }

  test("csv source round-trips through the csv sink with explicit schema") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-csvsrc").toString
    val df = docsDf(1L -> "alpha", 2L -> "beta")
    Sinks.writeCsvWithHeader(df, s"$dir/out", sep = "|")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val back = Sources.readCsv(spark, s"$dir/out", schema, header = true, sep = "|")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == Map(1L -> "alpha", 2L -> "beta"))
  }
}
