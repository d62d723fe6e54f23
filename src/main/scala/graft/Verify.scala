package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [entryName ...] — with names given, dump
    // only those entries (targeted re-checks at big SFs); oracle json
    // is written either way
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // The testdata parquet carries naive timestamp[us]; Spark 4 would
      // infer TIMESTAMP_NTZ, but the DuckDB oracle compares values as
      // UTC instants — read them as TIMESTAMP_LTZ (UTC session) so both
      // engines see identical instants. Set at every builder in graft.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      val target = java.nio.file.Paths.get(s"$outDir/$name.parquet")
      // repartition(1), NOT coalesce(1): coalesce propagates the
      // 1-partition constraint up to the previous shuffle, so a
      // shuffle-free pipeline (scan → per-row transforms → explode)
      // would execute as ONE task — measured 8 min for the sf1
      // text_chunk dump vs seconds. repartition inserts an exchange:
      // upstream keeps its parallelism, only the write is single-task.
      // Dump row order doesn't matter (the oracle compare sorts).
      try fn(spark, sfDir).repartition(1).write.mode("overwrite")
        .parquet(target.toString)
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // never leave a previous run's dump behind: a stale result
        // would score as a false PASS in the oracle compare
        if (java.nio.file.Files.exists(target)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(target).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Key each oracle BOTH ways: the driver's round-2 CORRECTNESS report
    // keyed every result by its parquet file name ("<name>.parquet") and
    // recorded `no_oracle` for all 50 bare-name keys — so the lookup key
    // is the file name, suffix included. Bare names are kept as a hedge
    // (harmless duplicates; tools/check_correctness.py normalizes).
    val json = SparkEntry.oracleSql
      .flatMap { case (k, v) => Seq(s"${q(k)}: ${q(v)}", s"${q(k + ".parquet")}: ${q(v)}") }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
