package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: stage-by-stage timings of the near-dup pipelines, for
  * finding which stage dominates before optimizing. Not part of the
  * driver contract (Bench reports the end-to-end numbers).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ops.MicroBench"
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", (!args.contains("noaqe")).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.parquetDir(spark, sfDir)("documents")

    def time(name: String)(df: => DataFrame): Unit = {
      def run(): Unit = df.write.format("noop").mode("overwrite").save()
      run(); run() // warm-up ×2 (codegen + C2)
      val t0 = System.nanoTime()
      run()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    if (args.contains("headline")) {
      Seq("q1_agg", "q3_shipping", "q5_local", "events_windowed").foreach { k =>
        time(k)(graft.SparkEntry.queries(k)(spark, sfDir))
      }
      spark.stop()
      return
    }

    val t = col("text")
    time("dedup-exact") {
      Dedup.exact(docs, "text", "doc_id")
    }
    time("tokens-explode") {
      docs.select(col("doc_id"), explode(NearDup.tokens(t)).as("w"))
    }
    time("shingles-explode") {
      docs.select(col("doc_id"), explode(NearDup.shingles(t)).as("s"))
    }
    time("shingles-hashed (legacy)") {
      docs.select(col("doc_id"), explode(NearDup.shingles(t)).as("s"))
        .select(col("doc_id"), expr("conv(substring(md5(cast(s as binary)), 1, 8), 16, 10)").cast("long").as("h"))
    }
    time("hashedShingles (window)") {
      NearDup.hashedShingles(docs, "text", "doc_id")
    }
    time("minhash-pairs (full)") {
      NearDup.minhashPairs(docs, "text", "doc_id")
    }
    time("ngram-pairs (full)") {
      NearDup.ngramJaccardPairs(docs, "text", "doc_id")
    }
    time("simhash-sigs") {
      NearDup.simhashSigs(docs, "text", "doc_id")
    }
    time("simhash-pairs (full)") {
      NearDup.simhashPairs(docs, "text", "doc_id")
    }

    if (args.contains("scale10")) {
      // 10× replication with shifted ids: every doc becomes a 10-clone
      // clique — the adversarial shape for any PAIRS operator (output
      // quadratic in clique size). The supported composition is
      // deduplicateCorpus: exact dedup first collapses cliques.
      val docs10 = (0 until 10)
        .map(i => docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"), col("text")))
        .reduce(_.union(_))
      time("minhash-pairs 10x (cliques)") {
        NearDup.minhashPairs(docs10, "text", "doc_id")
      }
      time("dedup-pipeline 10x") {
        NearDup.deduplicateCorpus(docs10, "text", "doc_id")
      }
      time("simhash-sigs 10x") {
        NearDup.simhashSigs(docs10, "text", "doc_id")
      }
    }
    spark.stop()
  }
}
