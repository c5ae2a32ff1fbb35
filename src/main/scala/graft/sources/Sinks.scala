package graft.sources

import graft.Caches.CheckpointSyntax
import org.apache.spark.sql.DataFrame
import graft.operators.{MinHashLsh, Shingling}

/** File sinks — reference operator O2 (SURVEY.md §2.1): CSV with
  * header, custom separator, overwrite-on-rerun. The reference
  * hand-rolled all three (header via Reducer.setup
  * Shingling.java:69-74, separator via
  * mapred.textoutputformat.separator Shingling.java:95, pre-delete
  * Shingling.java:97-100); here each is one writer option.
  */
object Sinks {

  /** CSV can't natively distinguish null from "" (the bare defaults
    * write both as an empty field and read both back as null), so the
    * sink writes null as an explicit unquoted sentinel and keeps ""
    * as the QUOTED empty field: with read nullValue no longer the
    * empty string, a quoted empty parses back to "" and the sentinel
    * to null. The residual precondition is only "no cell is literally
    * the sentinel string" — far weaker than the no-null / no-empty /
    * no-newline assumptions the defaults require (embedded newlines
    * are handled by writer quoting + multiLine read). */
  val CsvNullSentinel = "\\N"
  val CsvQuotedEmpty = "\"\""

  def writeCsvWithHeader(df: DataFrame, path: String, sep: String = ","): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("sep", sep)
      .option("nullValue", CsvNullSentinel)
      .option("emptyValue", CsvQuotedEmpty)
      .csv(path)

  /** Hive-style partitioned parquet — the training-data layout (e.g.
    * partition documents by language so per-language consumers get
    * partition pruning on read). repartition on the partition columns
    * first so each partition value is written by one task (without it
    * every task writes a file per value → small-file explosion at
    * scale). */
  def writePartitionedParquet(df: DataFrame, path: String,
                              partitionCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(partitionCols.map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** ORC sink (columnar interop twin of the parquet paths). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Reference-native line format `<doc_id>\t<escaped text>` — the
    * input shape the reference's jobs consume (one doc per line).
    * Backslash, TAB, LF, and CR are escaped so ANY text survives the
    * line format (CR matters: the reader frames with readLine, which
    * treats a raw CR as a terminator too);
    * [[graft.sources.v2.DocsTextSource]] reverses it. */
  def writeDocLines(df: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions._
    val esc = replace(replace(replace(replace(
      coalesce(df("text"), lit("")),
      lit("\\"), lit("\\\\")), lit("\t"), lit("\\t")),
      lit("\n"), lit("\\n")), lit("\r"), lit("\\r"))
    df.select(concat(df("doc_id").cast("string"), lit("\t"), esc).as("value"))
      .write.mode("overwrite").text(path)
  }

  /** Materialize the three reference-shaped artifacts for a document
    * set: the shingle inverted index (Job 1 output), the verified
    * pair list in both directions (Job 3 output), and the similar
    * pairs with scores. Column names follow the reference headers
    * where they exist. */
  def writeReferenceArtifacts(docs: DataFrame, outDir: String): Unit = {
    import org.apache.spark.sql.functions._
    writeCsvWithHeader(
      Shingling.shingleDict(docs)
        .select(col("shingle").as("Shingling"), col("doc_ids").as("rowsOffset")),
      s"$outDir/shingling")
    // run the expensive verify pipeline ONCE; both pair artifacts
    // derive from the materialized result
    val sim = MinHashLsh.similarPairs(docs).graftCheckpoint()
    val texts = docs.select(col("doc_id"), col("text"))
    val both = sim.select(col("id_l").as("id_a"), col("id_r").as("id_b"))
      .union(sim.select(col("id_r").as("id_a"), col("id_l").as("id_b")))
    writeCsvWithHeader(
      both
        .join(texts.as("ta"), col("id_a") === col("ta.doc_id"))
        .join(texts.as("tb"), col("id_b") === col("tb.doc_id"))
        .select(col("ta.text").as("Text1"), col("tb.text").as("Text2")),
      s"$outDir/pairs")
    writeCsvWithHeader(sim, s"$outDir/similar_scores")
  }
}
