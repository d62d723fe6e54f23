package graft

import org.apache.spark.sql.SparkSession

/** Headline-query benchmark (driver-run, one JSON line on stdout).
  *
  * Measures the §2.5 headline queries (SparkEntry.benchKeys) at the
  * scale factor in SPARK_GRAFT_SF_DIR. Each query gets two warm-up
  * executions (JIT + codegen + file-listing warmup), then THREE
  * measured runs of which the MEDIAN is reported — single-run noise at
  * sf0.1 is ±0.3 s (~14% of the headline total), large enough to mask
  * or fake a real regression. Results are fully materialized through
  * the `noop` sink —
  * every operator the user would pay for executes (projections, sorts,
  * exchanges), with no collect-to-driver and no output cost.
  *
  * A failing query is reported in an `errors` object and EXCLUDED from
  * `queries`; the total is the sum of successful queries only, so a
  * failure can never improve the score silently.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Spark's default 10 MB: broadcasts the dims and ONLY the dims.
      // Round 8's sf1 sweep showed a 64 MB threshold flipping the
      // fact-side joins to driver-built broadcasts (a 6M-row lineitem
      // HashedRelation) — 2.3x slower at sf1, no gain at sf0.1, and
      // the wrong shape for a cluster (facts shuffle, dims broadcast).
      .config("spark.sql.autoBroadcastJoinThreshold", (10 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    def timeMedian(name: String): Either[String, Double] =
      try {
        materialize(name) // warm-up 1: codegen, parquet footers, file index
        materialize(name) // warm-up 2: C2-compile the generated code
        val runs = Seq.fill(3) {
          val t0 = System.nanoTime()
          materialize(name)
          (System.nanoTime() - t0) / 1e9
        }
        Right(runs.sorted.apply(1))
      } catch {
        case e: Throwable =>
          Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }

    val results = SparkEntry.benchKeys.map(name => name -> timeMedian(name))

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""

    // LLM-pipeline ops, timed the same way but reported separately —
    // the headline total stays comparable to BASELINE.md's definition.
    val opsResults = SparkEntry.opsBenchKeys.map(name => name -> timeMedian(name))

    val ok = results.collect { case (k, Right(v)) => k -> v }
    val errs = (results ++ opsResults).collect { case (k, Left(m)) => k -> m }
    val qs = ok.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val os = opsResults.collect { case (k, Right(v)) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val es = errs.map { case (k, m) => s"${jstr(k)}:${jstr(m)}" }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    if (errs.nonEmpty) System.err.println(s"[bench] ${errs.size} queries FAILED: ${errs.map(_._1).mkString(", ")}")
    // stop Spark BEFORE printing so the JSON line is the last stdout
    // line of the run (shutdown logging lands above it, not after) —
    // robust whether the driver scans lines or takes the last one.
    // A throwing stop() must not lose the measurements already taken.
    try spark.stop()
    catch { case e: Throwable => System.err.println(s"[bench] spark.stop failed: $e") }
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"ops":$os,"errors":$es,"sf":${jstr(sfDir)}}"""
    )
    System.out.flush()
  }
}
