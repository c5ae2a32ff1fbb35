package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: explode the small side with
  * `saltFactor` replicas and scatter the big side's hot keys across
  * them, so a single hot key occupies saltFactor reducer partitions
  * instead of one. Deterministic salt (hash of a stable column mod
  * factor) keeps results reproducible.
  *
  * At 100 TB this is the manual fallback for the cases AQE's skew
  * split can't fix (e.g. a broadcast-ineligible dimension with one
  * giant key); for LSH buckets the `maxBucket` guard in
  * MinHashLsh.candidatePairs is the preferred cap.
  */
object Salting {

  /** Inner-join `big` with `small` on `key`, salted. `bigSaltSrc`
    * must be a stable big-side expression that VARIES WITHIN a join
    * key (a line number, a row digest — anything row-distinguishing):
    * the salt is derived from it, so passing the join key itself
    * would give every row of a hot key the same salt and defeat the
    * scatter entirely. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     bigSaltSrc: Column, saltFactor: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(bigSaltSrc), lit(saltFactor)).cast("int"))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
