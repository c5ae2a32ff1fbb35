package graft

import org.apache.spark.storage.StorageLevel

/** releaseAll must free ONLY graft-created checkpoint blocks: a frame
  * the user cached (or checkpointed) deliberately survives a
  * Bench/Verify-style release loop. */
class CachesSpec extends SparkSpec {

  test("releaseAll frees graft checkpoints but leaves user caches and checkpoints alone") {
    val s = spark
    import s.implicits._

    val user = (1L to 100L).toDF("id").cache()
    assert(user.count() == 100)
    val userCp = (1L to 50L).toDF("id").localCheckpoint()
    assert(userCp.count() == 50)

    val graftFrame = Caches.checkpoint((1L to 10L).toDF("id"))
    assert(graftFrame.count() == 10)

    def persistedIds = s.sparkContext.getPersistentRDDs.keySet
    val beforeRelease = persistedIds
    Caches.releaseAll(s)
    // async unpersist: wait for the graft blocks to drop out
    val deadline = System.nanoTime() + 10_000_000_000L
    while (persistedIds.size > beforeRelease.size - 1 && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(persistedIds.size < beforeRelease.size,
      s"graft checkpoint not released: $beforeRelease -> $persistedIds")

    // user-owned data is still persisted AND still collectable — the
    // r3-advice failure mode was releaseAll dropping a user's
    // localCheckpoint blocks, making the frame unrecoverable
    assert(user.storageLevel != StorageLevel.NONE)
    assert(user.count() == 100)
    assert(userCp.count() == 50)
    user.unpersist()
  }

  test("a second releaseAll after the registry is drained is a no-op") {
    Caches.releaseAll(spark) // must not throw with an empty registry
  }
}
