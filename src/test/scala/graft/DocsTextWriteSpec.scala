package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

class DocsTextWriteSpec extends SparkSpec {

  private val Fmt = "graft.sources.v2.DocsTextSource"

  test("v2 write → v2 read round-trips arbitrary text") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-v2w").toString
    val rows = Seq(1L -> "plain", 2L -> "tab\tand\nnewline\rand\\slash", 3L -> "")
    rows.toDF("doc_id", "text").repartition(2)
      .write.format(Fmt).mode("append").save(dir)
    val back = spark.read.format(Fmt).load(dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, t) => assert(back(id) == t, s"doc $id mangled") }
  }

  test("overwrite truncates committed files, append accumulates") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-v2o").toString
    Seq(1L -> "one").toDF("doc_id", "text").coalesce(1)
      .write.format(Fmt).mode("append").save(dir)
    Seq(2L -> "two").toDF("doc_id", "text").coalesce(1)
      .write.format(Fmt).mode("overwrite").save(dir)
    val ids = spark.read.format(Fmt).load(dir).collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(2L), s"overwrite must replace, saw $ids")
  }

  test("append into a populated directory accumulates — never clobbers") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-v2a").toString
    // both jobs use partition 0..1: without job-unique final names the
    // second append would rename over the first job's part files
    Seq(1L -> "job one a", 2L -> "job one b").toDF("doc_id", "text")
      .repartition(2).write.format(Fmt).mode("append").save(dir)
    Seq(3L -> "job two a", 4L -> "job two b").toDF("doc_id", "text")
      .repartition(2).write.format(Fmt).mode("append").save(dir)
    val ids = spark.read.format(Fmt).load(dir)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L),
      s"second append clobbered the first job's files, saw $ids")
  }

  test("a failed job leaves the destination untouched (two-phase commit)") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-v2f").toString
    Seq(1L -> "committed").toDF("doc_id", "text").coalesce(1)
      .write.format(Fmt).mode("append").save(dir)
    // second job writes rows then a task throws: its attempts must
    // abort and job-abort must drop the temp dir — nothing lands
    val boom = spark.range(0, 100, 1, 4)
      .select(col("id").as("doc_id"),
        when(col("id") === 73L,
          raise_error(lit("planted failure"))).otherwise(lit("x")).as("text"))
    intercept[Exception] {
      boom.write.format(Fmt).mode("append").save(dir)
    }
    val visible = spark.read.format(Fmt).load(dir)
      .collect().map(_.getLong(0)).toSeq
    assert(visible == Seq(1L),
      s"failed job must be invisible, saw ids $visible")
    val leftover = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("_temporary"))
    assert(leftover.isEmpty, s"temp dirs must be cleaned: ${leftover.mkString(",")}")
  }
}
