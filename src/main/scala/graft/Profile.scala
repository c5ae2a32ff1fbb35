package graft

import graft.Caches.CheckpointSyntax
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiling of the LSH chain (dev aid, not part of the
  * driver contract): times each stage of similarPairs in isolation so
  * per-query cost can be attributed. Usage: runMain graft.Profile <sfDir>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = operators.Par.widen(spark.read.parquet(s"$sfDir/documents.parquet"))
    docs.limit(1).collect()

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    time("docs count")(docs.count())
    time("signatures (narrow)")(
      operators.MinHashLsh.signatures(docs).agg(sum(col(Config.sigCol(0)))).collect())
    time("signaturesWithSets")(
      operators.MinHashLsh.signaturesWithSets(docs)
        .agg(sum(col(Config.sigCol(0))), sum(size(col("hset")))).collect())
    val base = time("sigsWithSets checkpoint")(
      operators.MinHashLsh.signaturesWithSets(docs).graftCheckpoint())
    time("bands+selfjoin raw count") {
      val b = operators.MinHashLsh.bandsFromSignatures(base)
      operators.MinHashLsh.candidatesFromBands(b, dedupe = false).count()
    }
    time("candidatePairs (distinct)")(
      operators.MinHashLsh.candidatePairs(docs).count())
    time("similarPairs full")(
      operators.MinHashLsh.similarPairs(docs).count())
    time("similarPairs again")(
      operators.MinHashLsh.similarPairs(docs).count())

    // MLlib pillar-B cost attribution
    {
      import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH}
      val docs500 = docs.filter(col("doc_id") < 500)
      val sets = time("ml: shingleSets+ckpt")(
        operators.Shingling.shingleSets(docs500).coalesce(4).graftCheckpoint())
      val cv = new CountVectorizer().setInputCol("shingle_set")
        .setOutputCol("features").setBinary(true).setVocabSize(1 << 21)
      val cvm = time("ml: cv.fit")(cv.fit(sets))
      val vecs = time("ml: cv.transform+ckpt")(cvm.transform(sets).graftCheckpoint())
      val mh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
        .setNumHashTables(5).setSeed(Config.Seed)
      val model = time("ml: mh.fit")(mh.fit(vecs))
      time("ml: approxSimilarityJoin")(
        model.approxSimilarityJoin(vecs, vecs, 0.2 + 1e-9, "jaccard_dist").count())
    }

    // pillar-B pairsBanded attribution (r14): the full-corpus AND-OR
    // banded form is the top non-stream bench query — which stage owns
    // the time decides whether there's a non-MLlib-internal lever
    {
      import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH}
      import org.apache.spark.ml.functions.vector_to_array
      val rawSets = operators.Shingling.shingleSets(docs)
      val sets = time("mlB: shingleSets+ckpt")(rawSets.graftCheckpoint())
      val cv = new CountVectorizer().setInputCol("shingle_set")
        .setOutputCol("features").setBinary(true).setVocabSize(1 << 21)
      val cvm = time("mlB: cv.fit")(cv.fit(sets))
      val vecs = time("mlB: cv.transform+ckpt")(
        cvm.transform(sets).select(col("doc_id"), col("features")).graftCheckpoint())
      val mh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
        .setNumHashTables(Config.Bands * Config.RowsPerBand).setSeed(Config.Seed)
      val model = time("mlB: mh.fit")(mh.fit(vecs))
      val bandKeys = (0 until Config.Bands).map { j =>
        concat_ws(",", (0 until Config.RowsPerBand).map { r =>
          vector_to_array(element_at(col("hashes"), j * Config.RowsPerBand + r + 1))
            .getItem(0).cast("long").cast("string")
        }: _*)
      }
      val banded = time("mlB: transform+band ckpt")(
        model.transform(vecs)
          .select(col("doc_id"), posexplode(array(bandKeys: _*)).as(Seq("band", "band_key")))
          .graftCheckpoint())
      val l = banded.select(col("band"), col("band_key"), col("doc_id").as("id_l"))
      val r = banded.select(col("band"), col("band_key"), col("doc_id").as("id_r"))
      time("mlB: selfjoin+distinct")(
        l.join(r, Seq("band", "band_key")).filter(col("id_l") < col("id_r"))
          .select("id_l", "id_r").distinct().count())
      time("mlB: pairsBanded full")(ml.MlMinHash.pairsBanded(docs).count())
      Caches.releaseAll(spark)
    }

    // as-of operator scaling: the window-over-union formulation vs
    // the native merge-scan operator on replicated event streams
    // (disjoint user/event id ranges per replica — same per-user
    // density, m× the users, the realistic growth axis)
    val events0 = operators.Par.widen(spark.read.parquet(s"$sfDir/events.parquet"))
    Seq(8, 32, 64).foreach { m =>
      val reps = (0 until m).map { r =>
        events0.select((col("event_id") + lit(r * 100000000L)).as("event_id"),
          col("ts"), (col("user_id") + lit(r * 10000000L)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }
      val big = reps.reduce(_ union _).repartition(32).graftCheckpoint()
      // force every output column (count() would let Catalyst prune
      // the unreferenced window expressions — the Bench r1 pitfall)
      def force(df: org.apache.spark.sql.DataFrame): Unit =
        df.select(xxhash64(df.columns.map(col): _*).as("h"))
          .agg(expr("bit_xor(h)")).collect()
      def timeMin(name: String)(f: => Unit): Unit = {
        val best = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }.min
        println(f"[profile] $name%-28s $best%8.3f s (best of 3)")
      }
      timeMin(s"asOf window x$m")(force(operators.EventsOps.asOfJoin(big)))
      timeMin(s"asOf native x$m")(force(operators.EventsOps.asOfJoinNative(big)))
    }

    // skew experiment: 90% of a 4M-row fact sits on ONE key; plain
    // shuffle join puts that key in a single task, salting scatters
    // it across 8
    {
      import org.apache.spark.sql.functions.{broadcast => _, _}
      val n = 4000000L
      val facts = spark.range(n).select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 1000L).as("k"),
        col("id").as("v")).graftCheckpoint()
      val dim = spark.range(1000).select(col("id").as("k"),
        concat(lit("name_"), col("id")).as("name")).graftCheckpoint()
      def timeMin(name: String)(f: => Unit): Unit = {
        val best = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }.min
        println(f"[profile] $name%-28s $best%8.3f s (best of 3)")
      }
      // disable broadcast so both paths exercise the SHUFFLE join the
      // skew guard exists for (a 1000-row dim would broadcast and
      // sidestep skew entirely — at scale the dim side is too big)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      timeMin("skew join plain")(
        facts.join(dim, Seq("k")).agg(count(lit(1))).collect())
      timeMin("skew join salted x8")(
        operators.Salting.saltedEquiJoin(facts, dim, "k", col("v"))
          .agg(count(lit(1))).collect())
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      timeMin("skew join plain AQE")(
        facts.join(dim, Seq("k")).agg(count(lit(1))).collect())
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (64 * 1024 * 1024).toString)
    }

    // scale-slope experiment: replicate the corpus in memory with
    // disjoint id ranges (replicas don't cross-match: texts get a
    // replica tag appended so shingle sets differ) and measure how the
    // chain scales with corpus size — the empirical basis for the
    // 100 TB extrapolation in DESIGN.md
    val scales = args.drop(1).headOption.map(_.toInt).map(Seq(_)).getOrElse(Seq(2, 4, 8))
    val n = docs.count()
    scales.foreach { m =>
      val reps = (0 until m).map { r =>
        docs.select((col("doc_id") + lit(r * 10 * n)).as("doc_id"),
          concat(col("text"), lit(s" replica$r")).as("text"))
      }
      val big = reps.reduce(_ union _).repartition(32).graftCheckpoint()
      time(s"similarPairs x$m corpus")(
        operators.MinHashLsh.similarPairs(big).count())
      time(s"similarPairs x$m maxBucket=64")(
        operators.MinHashLsh.similarPairs(big, maxBucket = Some(64)).count())
    }
    spark.stop()
  }
}
