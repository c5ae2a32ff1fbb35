package graft.sources

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

  def writeCsvWithHeader(df: DataFrame, path: String, sep: String = ","): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("sep", sep)
      .csv(path)

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
    writeCsvWithHeader(
      MinHashLsh.pairsSymmetric(docs)
        .select(col("text_a").as("Text1"), col("text_b").as("Text2")),
      s"$outDir/pairs")
    writeCsvWithHeader(
      MinHashLsh.similarPairs(docs),
      s"$outDir/similar_scores")
  }
}
