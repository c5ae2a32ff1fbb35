package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File sources — reference operator O1 (SURVEY.md §2.1):
  * TextInputFormat hands each mapper (byteOffset, line) and the
  * offset becomes the document id (Shingling.java:33,40). The
  * documents-shaped frame this produces feeds every pipeline
  * operator, so raw-corpus ingestion is one call.
  */
object Sources {

  /** Read a text file (or directory of them) as (doc_id, text).
    *
    * Id semantics: contiguous 0-based LINE numbers in file order via
    * zipWithIndex — deterministic for a fixed input, like the
    * reference's byte offsets (SURVEY.md §1: the offset VALUE is an
    * artifact; stable identity is the requirement).
    * `monotonically_increasing_id` would be cheaper (no extra job to
    * count per-partition rows) but emits partition-encoded gaps; use
    * `contiguous = false` for that at scale where gaps are fine. */
  def readTextWithIds(spark: SparkSession, path: String,
                      contiguous: Boolean = true): DataFrame =
    if (contiguous) {
      val rdd = spark.sparkContext.textFile(path).zipWithIndex()
        .map { case (line, i) => (i, line) }
      spark.createDataFrame(rdd).toDF("doc_id", "text")
    } else {
      spark.read.text(path)
        .select(monotonically_increasing_id().as("doc_id"),
          col("value").as("text"))
    }

  /** JSON-lines source with an EXPLICIT schema. Schema inference
    * reads the whole input once before the query even starts — an
    * extra full pass at 100 TB — and silently widens types on dirty
    * data; a declared StructType makes the scan single-pass and the
    * contract explicit. Corrupt lines land in a `_corrupt_record`
    * column when the schema declares one (PERMISSIVE default). */
  def readJsonl(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** CSV source with explicit schema + header handling (same
    * no-inference rationale as [[readJsonl]]; `inferSchema` would
    * also be a full extra pass). */
  /** nullValue/emptyValue sentinels mirror [[Sinks.writeCsvWithHeader]]
    * so null and "" survive a round trip (the CSV defaults collapse
    * both to null on read). multiLine=true parses quoted embedded
    * newlines correctly — the cost is that each file is parsed whole
    * (non-splittable), so intra-file parallelism is gone; at scale the
    * writer side compensates by emitting many files (one per task),
    * which is what [[Sinks.writeCsvWithHeader]] does. */
  def readCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType,
              header: Boolean = true, sep: String = ",",
              multiLine: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("sep", sep)
      .option("multiLine", multiLine.toString)
      .option("nullValue", Sinks.CsvNullSentinel)
      // read-side emptyValue is what a quoted-empty field BECOMES
      .option("emptyValue", "")
      .csv(path)

  /** ORC source — columnar like parquet (self-describing schema,
    * predicate pushdown, column pruning), here for interop with
    * Hive-era corpora. No schema argument needed: ORC footers carry
    * it, same as parquet. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
