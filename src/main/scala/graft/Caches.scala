package graft

import org.apache.spark.sql.{Dataset, SparkSession}

/** Session cache hygiene. Several operators materialize internal
  * frames with `localCheckpoint` (consumed by multiple joins in one
  * query); those blocks stay pinned in executor storage memory for
  * the session's lifetime unless released. A long-lived session that
  * runs many queries — a benchmark loop, a notebook, a query service
  * — must release them between queries or execution memory shrinks
  * until unrelated queries spill (measured: a 93-query loop slowed
  * 2.8× across the board before Bench/Verify adopted this).
  *
  * Operators route their checkpoints through [[checkpoint]], which
  * records the persisted RDD ids it creates; [[releaseAll]] then
  * frees ONLY those — a frame the caller cached deliberately
  * (`df.cache()`, a user's own `localCheckpoint`) survives.
  */
object Caches {

  // ids of persistent RDDs created by graft operators' checkpoint()
  private val graftIds = scala.collection.mutable.Set.empty[Int]

  /** `ds.localCheckpoint()` + registration: the persisted blocks this
    * call creates are tracked so releaseAll can free them without
    * touching caller-owned caches. (The registration is a
    * before/after diff of the session's persistent-RDD ids under this
    * object's lock — concurrent graft checkpoints stay correctly
    * attributed; a caller persisting on another thread in the same
    * instant could be mis-captured, which is benign for the internal
    * Bench/Verify/Explain loops this serves.) */
  def checkpoint[T](ds: Dataset[T]): Dataset[T] = synchronized {
    val sc = ds.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val cp = ds.localCheckpoint()
    graftIds ++= (sc.getPersistentRDDs.keySet -- before)
    cp
  }

  /** LAZY [[checkpoint]]: marks the frame for local checkpointing but
    * runs NO job — the caller's next action over the returned frame
    * materializes the blocks AND truncates lineage in that one job.
    * This is how an iterative operator folds its convergence probe
    * into the update pass (one job per iteration instead of
    * checkpoint-then-probe). Registered for releaseAll like the eager
    * form (localCheckpoint persists at mark time). */
  def checkpointLazy[T](ds: Dataset[T]): Dataset[T] = synchronized {
    val sc = ds.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val cp = ds.localCheckpoint(eager = false)
    graftIds ++= (sc.getPersistentRDDs.keySet -- before)
    cp
  }

  /** Unpersist every graft-created checkpoint block and forget the
    * registry. Safe after a query's results are consumed: graft
    * checkpoints are query-internal, never shared across queries.
    * NOTE a DataFrame previously RETURNED by a graft operator may
    * hold one of these checkpoints in its lineage — re-collecting it
    * after release throws (localCheckpoint truncates lineage, so the
    * blocks are unrecoverable); release between queries, not between
    * uses of one result.
    *
    * BLOCKING (r13): the async form let tens of GB of stale blocks
    * linger in the unified memory pool between queries at scale
    * corpora; the NEXT query's memory acquisitions then paid a
    * single-threaded eviction storm inside the memory manager
    * (observed: a broadcast hash-relation build pinning one core for
    * minutes while 31 executors idled — dedup_keep_best 692 s chained
    * vs 26 s solo at 250k docs, identical shuffle/peak-mem bytes).
    * Waiting for removal here costs the RELEASING query milliseconds
    * and buys the next query a clean pool. */
  def releaseAll(spark: SparkSession): Unit = synchronized {
    val persisted = spark.sparkContext.getPersistentRDDs
    graftIds.foreach(id => persisted.get(id).foreach(_.unpersist(blocking = true)))
    graftIds.clear()
  }

  /** `.graftCheckpoint()` syntax for [[checkpoint]] /
    * [[checkpointLazy]]. */
  implicit class CheckpointSyntax[T](private val ds: Dataset[T]) extends AnyVal {
    def graftCheckpoint(): Dataset[T] = Caches.checkpoint(ds)
    def graftCheckpointLazy(): Dataset[T] = Caches.checkpointLazy(ds)
  }

  /** Session discriminator for caches that hold DATAFRAMES (r11
    * advice): a DataFrame is bound to the SparkSession that built it,
    * so a JVM-global cache keyed only by plan+data signature would
    * serve a second session in the same JVM frames bound to the old —
    * possibly stopped — context. Keys of frame-holding caches
    * (EmbeddingSim.scoredCache, AnnRecall.exactCache) include this;
    * MODEL caches (the IVF quantizer, the CountVectorizer vocabulary)
    * deliberately do not — models are plain serializable objects,
    * valid across sessions. (SparkSession.sessionUUID is private[sql];
    * applicationId discriminates contexts — the stopped-context
    * hazard — and the identity hash discriminates sibling sessions
    * sharing one live context.) */
  private[graft] def sessionTag(ds: Dataset[_]): String = {
    val s = ds.sparkSession
    s"${s.sparkContext.applicationId}@${System.identityHashCode(s)}"
  }

  /** Cache key that CHANGES WITH THE DATA, not just the plan: the
    * canonicalized plan plus every input file's (path, length,
    * mod-time). Rewriting parquet at the same path therefore misses
    * a model cache and refits instead of silently serving stale
    * state; a non-file input (in-memory frame) degrades to the plan
    * string alone. Shared by the session-scoped fit-once/serve-many
    * model caches (EmbeddingSim's IVF quantizer, MlMinHash's
    * vectorizer vocabulary). */
  private[graft] def dataSignature(df: Dataset[_]): String = {
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val files = df.inputFiles.sorted.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val st = p.getFileSystem(conf).getFileStatus(p)
      s"$f:${st.getLen}:${st.getModificationTime}"
    }
    df.queryExecution.analyzed.canonicalized.toString + files.mkString("|", ";", "")
  }
}
