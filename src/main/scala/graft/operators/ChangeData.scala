package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture and history operators — the ingest realities
  * of a corpus that keeps moving under the pipeline:
  *
  *  - [[cdcMerge]]: latest-wins MERGE of a change feed (upserts +
  *    deletes, versioned) into a snapshot — the `MERGE INTO` /
  *    compaction-read shape every table format (Hive ACID, Iceberg,
  *    Delta) implements on top of exactly this plan.
  *  - [[scd2History]]: slowly-changing-dimension (type 2) interval
  *    build from an ordered change stream — consecutive duplicate
  *    states collapsed, each surviving state carrying its validity
  *    interval, the current row flagged.
  *
  * 100-TB posture: both are ONE shuffle on the merge/entity key.
  * cdcMerge reduces with `max_by` — an aggregate with a map-side
  * partial, NOT a window (a row_number window would sort every
  * group; the aggregate keeps one struct per key per map task).
  * scd2History's windows partition by the entity key, so state is
  * bounded by the hottest single entity, never the table; both AQE-
  * coalesce and skew-split cleanly because the key is the shuffle
  * key. The change feed here is synthesized deterministically from
  * the documents table (the corpus has no real feed) — swapping in a
  * real Kafka/landing-dir feed changes only the source, not the
  * plan.
  */
object ChangeData {

  /** Deterministic change feed over the documents snapshot:
    *   v1 upsert  for doc_id % 7 == 0  (text gains a revision tag),
    *   v2 upsert  for doc_id % 11 == 0 (a second revision),
    *   v3 delete  for doc_id % 13 == 0.
    * A key can carry any subset — the merge must take the HIGHEST
    * version and honor a delete that outranks prior upserts. */
  private[operators] def changeFeed(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("lang"), col("source"),
      col("n_chars"), col("text"))
    val up1 = base.filter(col("doc_id") % 7 === 0)
      .withColumn("text", concat(col("text"), lit(" [rev1]")))
      .withColumn("n_chars", col("n_chars") + 7)
      .withColumn("version", lit(1L)).withColumn("op", lit("U"))
    val up2 = base.filter(col("doc_id") % 11 === 0)
      .withColumn("text", concat(col("text"), lit(" [rev2]")))
      .withColumn("n_chars", col("n_chars") + 7)
      .withColumn("version", lit(2L)).withColumn("op", lit("U"))
    val del = base.filter(col("doc_id") % 13 === 0)
      .withColumn("version", lit(3L)).withColumn("op", lit("D"))
    up1.unionByName(up2).unionByName(del)
  }

  /** Latest-wins merge: snapshot rows enter at version 0, the feed
    * at 1..3; per key the highest version's payload survives and a
    * winning delete removes the key. `n_revs` counts every record
    * seen for the key (snapshot + feed), so the output also audits
    * feed fan-in. One hash aggregate on the key — `max_by(struct,
    * version)` has a map-side partial combine, the scale-safe twin
    * of the row_number-window merge. */
  def cdcMerge(docs: DataFrame): DataFrame =
    mergeLatest(versionedFeed(docs))

  /** The full versioned record stream: snapshot rows at version 0,
    * the change feed at 1..3 — one frame so the SAME stream can be
    * replayed in micro-batches by the streaming twin. */
  private[graft] def versionedFeed(docs: DataFrame): DataFrame = {
    val snapshot = docs.select(col("doc_id"), col("lang"), col("source"),
        col("n_chars"), col("text"))
      .withColumn("version", lit(0L)).withColumn("op", lit("I"))
    snapshot.unionByName(changeFeed(docs))
  }

  /** The latest-wins reduction itself — order-free (max_by by
    * version commutes), so it serves the batch table AND a
    * complete-mode streaming aggregation unchanged. */
  private[graft] def mergeLatest(all: DataFrame): DataFrame =
    all.groupBy(col("doc_id"))
      .agg(
        max_by(struct(col("op"), col("lang"), col("source"), col("n_chars"),
          col("text")), col("version")).as("w"),
        max(col("version")).as("latest_version"),
        count(lit(1)).as("n_revs"))
      .filter(col("w.op") =!= "D")
      .select(col("doc_id"), col("latest_version"), col("n_revs"),
        col("w.lang").as("lang"), col("w.source").as("source"),
        col("w.n_chars").as("n_chars"), col("w.text").as("text"))

  /** SCD-type-2 interval build over the events stream, tracking each
    * user's `event_type` as the slowly-changing attribute: rows are
    * ordered per user by (ts, event_id) — event_id breaks ts ties so
    * the order is total — consecutive duplicate states collapse (a
    * repeat of the same state is NOT a new version), and each
    * surviving state spans [valid_from, valid_to) with the open
    * current row flagged. Both windows partition by user_id.
    * Timestamps surface as epoch micros (the oracle convention for
    * every events query — hash-portable across engines). */
  def scd2History(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val changes = events
      .select(col("user_id"), EventsOps.microsCol(events).as("us"),
        col("event_id"), col("event_type"))
      .withColumn("prev_state", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_state").isNull || col("prev_state") =!= col("event_type"))
      .drop("prev_state")
    changes
      .withColumn("valid_to_us", lead(col("us"), 1).over(byUser))
      .select(col("user_id"), col("event_type").as("state"),
        col("us").as("valid_from_us"), col("event_id").as("from_event"),
        col("valid_to_us"),
        when(col("valid_to_us").isNull, lit(1L)).otherwise(lit(0L)).as("is_current"))
  }
}
