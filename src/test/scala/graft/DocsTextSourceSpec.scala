package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Sinks

class DocsTextSourceSpec extends SparkSpec {

  private def roundTrip(rows: Seq[(Long, String)], splitBytes: Long = 64 * 1024) = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-dsv2").toString
    Sinks.writeDocLines(rows.toDF("doc_id", "text"), dir)
    spark.read.format("graft.sources.v2.DocsTextSource")
      .option("splitBytes", splitBytes.toString).load(dir)
  }

  test("escape/unescape are exact inverses for arbitrary text (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import graft.sources.v2.DocsTextSource.{escape, unescape}
    val textGen = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar, 1 -> Gen.const('\\'), 1 -> Gen.const('\t'),
      1 -> Gen.const('\n'), 1 -> Gen.const('\r'),
      1 -> Gen.oneOf('é', '中', '≤', ' '))).map(_.mkString)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500),
      Prop.forAll(textGen) { s =>
        val e = escape(s)
        unescape(e) == s &&
          !e.contains('\n') && !e.contains('\r') && !e.contains('\t')
      })
    assert(res.passed, s"escape property: ${res.status}")
  }

  test("escape round trip survives tabs, newlines, CRs, and backslashes") {
    val rows = Seq(
      1L -> "plain text",
      2L -> "tab\there and\there",
      3L -> "line one\nline two\n",
      4L -> "back\\slash and \\t literal",
      5L -> "",
      6L -> "carriage\rreturn and \r\n pair")
    val back = roundTrip(rows).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, t) =>
      assert(back(id) == t, s"doc $id mangled: got ${back(id)}")
    }
  }

  test("byte-range splits read every line exactly once") {
    val rows = (0L until 500L).map(i => i -> s"document number $i with some padding text")
    // tiny splits: hundreds of ranges, most starting mid-line
    val split = roundTrip(rows, splitBytes = 256)
    assert(split.rdd.getNumPartitions > 10, "tiny splitBytes must produce many partitions")
    val got = split.collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    assert(got.length == 500, s"expected 500 rows, got ${got.length}")
    assert(got.toSeq == rows.sortBy(_._1), "split reads must equal the unsplit content")
  }

  test("doc_id filter is pushed into the reader and column pruning reaches the scan") {
    val df = roundTrip((0L until 100L).map(i => i -> s"text $i"))
      .filter(col("doc_id") >= 50L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [GreaterThanOrEqual(doc_id,50)"),
      s"bound must appear in the scan description, plan was:\n$plan")
    assert(df.count() == 50)
    val pruned = roundTrip((0L until 10L).map(i => i -> s"t $i")).select("doc_id")
    val prunedPlan = pruned.queryExecution.executedPlan.toString
    assert(prunedPlan.contains("ReadSchema: struct<doc_id:bigint>"),
      s"text must be pruned from the read schema, plan was:\n$prunedPlan")
  }

  test("limit pushdown stops readers early and keeps limit semantics") {
    val df = roundTrip((0L until 1000L).map(i => i -> s"text $i")).limit(7)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit: 7"),
      s"limit must reach the scan description, plan was:\n$plan")
    assert(df.count() == 7)
    // pushed limit must compose with pushed filters (partition-local
    // limit applies to SURVIVING rows, so the global result is intact)
    val filtered = roundTrip((0L until 1000L).map(i => i -> s"text $i"))
      .filter(col("doc_id") >= 990L).limit(5)
    assert(filtered.count() == 5)
    assert(filtered.collect().forall(_.getLong(0) >= 990L))
  }

  test("externally-produced files: no trailing newline, empty dir, empty file") {
    val dir = Files.createTempDirectory("graft-dsv2-ext")
    // a producer that doesn't end the last line — both rows must read
    Files.write(dir.resolve("a.txt"),
      "1\thello\n2\tworld".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.write(dir.resolve("b.txt"), Array.emptyByteArray)
    val got = spark.read.format("graft.sources.v2.DocsTextSource")
      .load(dir.toString).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "hello", 2L -> "world"))
    val empty = Files.createTempDirectory("graft-dsv2-empty")
    assert(spark.read.format("graft.sources.v2.DocsTextSource")
      .load(empty.toString).count() == 0)
  }

  test("a line starting exactly on a split boundary is read exactly once") {
    // every line exactly 32 bytes, splitBytes = 32: EVERY line starts
    // exactly on a split boundary — the worst case for the Hadoop
    // line contract (left split must read the boundary line, right
    // split must skip it; a strict `< end` loop loses them all)
    val dir = Files.createTempDirectory("graft-dsv2-bound")
    val lines = (0 until 100).map { i =>
      val head = s"$i\t"
      head + ("x" * (31 - head.length)) + "\n"
    }
    lines.foreach(l => assert(l.length == 32))
    Files.write(dir.resolve("a.txt"),
      lines.mkString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val got = spark.read.format("graft.sources.v2.DocsTextSource")
      .option("splitBytes", "32").load(dir.toString)
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (0L until 100L),
      s"boundary-aligned lines lost or duplicated: ${got.length} of 100")
    // and at a coprime split size (boundaries land mid-line AND on
    // line starts at irregular places) the content is identical too
    val coprime = spark.read.format("graft.sources.v2.DocsTextSource")
      .option("splitBytes", "97").load(dir.toString)
      .collect().map(_.getLong(0)).sorted
    assert(coprime.toSeq == (0L until 100L))
  }

  test("externally-produced CRLF and lone-CR files keep byte accounting exact") {
    // BufferedReader-style framing would count 1 byte per terminator
    // and drift 1 byte per CRLF line, silently corrupting split
    // boundaries; raw-byte framing counts what was actually consumed
    val dir = Files.createTempDirectory("graft-dsv2-crlf")
    val crlf = (0 until 200).map(i => s"$i\tcrlf line $i").mkString("\r\n") + "\r\n"
    Files.write(dir.resolve("crlf.txt"),
      crlf.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val gotCrlf = spark.read.format("graft.sources.v2.DocsTextSource")
      .option("splitBytes", "64").load(dir.toString)
      .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    assert(gotCrlf.length == 200,
      s"CRLF drift lost/duplicated rows: got ${gotCrlf.length} of 200")
    assert(gotCrlf.toSeq == (0 until 200).map(i => i.toLong -> s"crlf line $i"))

    val dir2 = Files.createTempDirectory("graft-dsv2-cr")
    val cr = (0 until 50).map(i => s"$i\tcr line $i").mkString("\r") + "\r"
    Files.write(dir2.resolve("cr.txt"),
      cr.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val gotCr = spark.read.format("graft.sources.v2.DocsTextSource")
      .option("splitBytes", "48").load(dir2.toString)
      .collect().map(_.getLong(0)).sorted
    assert(gotCr.toSeq == (0L until 50L),
      s"lone-CR framing lost rows: got ${gotCr.length} of 50")
  }

  test("a malformed line surfaces loudly instead of dropping data") {
    val dir = Files.createTempDirectory("graft-dsv2-bad")
    Files.write(dir.resolve("a.txt"),
      "1\tok\nno tab here\n2\talso ok\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft.sources.v2.DocsTextSource")
        .load(dir.toString).count()
    }
    assert(e.getMessage.contains("malformed doc line") ||
      Option(e.getCause).exists(_.getMessage.contains("malformed doc line")))
  }

  test("connector equals the documents table on real corpus data") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select("doc_id", "text")
    val dir = Files.createTempDirectory("graft-dsv2-corpus").toString
    Sinks.writeDocLines(docs, dir)
    val back = spark.read.format("graft.sources.v2.DocsTextSource")
      .option("splitBytes", "4096").load(dir)
    assert(back.except(docs).isEmpty && docs.except(back).isEmpty)
  }
}
