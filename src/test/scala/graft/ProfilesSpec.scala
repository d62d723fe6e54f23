package graft

/** Plan-level assertion for the cluster deployment profile (round-18
  * ask #5): under [[Profiles.cluster]], Spark's `InjectRuntimeFilter`
  * actually injects a bloom filter into q3_shipping's plan —
  * `might_contain(xxhash64(...))` in a scan-side Filter beneath the
  * first SortMergeJoin. No wall-time claim (BASELINE r17: the local
  * VM cannot measure the win; the 80% row cut is DuckDB-verified).
  *
  * The test data is 1000× smaller than the profile's target, so the
  * two SIZE gates are shimmed to reproduce the at-scale shape —
  * exactly the knobs whose values scale with data size, never the
  * mechanics:
  *   - `applicationSideScanSizeThreshold=0` (the probe side is MBs
  *     here, TBs in deployment);
  *   - broadcast joins off (at sf0.001 every side broadcasts; at
  *     100 TB the data-sized joins are SMJ — the r17 sf100 explain
  *     audit pinned that).
  */
class ProfilesSpec extends SparkTestBase {

  test("cluster profile injects q3's runtime bloom filter ahead of the first SMJ") {
    val shim = Profiles.cluster() ++ Map(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // the shared test session runs 4 shuffle partitions; the
      // cluster partition count is not what this plan test is about
      "spark.sql.shuffle.partitions" -> "4"
    )
    val prev = Profiles.applyTo(spark, shim)
    try {
      val df = SparkEntry.queries("q3_shipping")(spark, "/root/testdata/sf0.001")
      val optimized = df.queryExecution.optimizedPlan.toString
      val physical = df.queryExecution.executedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter injected under the cluster profile:\n$optimized")
      assert(physical.contains("SortMergeJoin"),
        "expected the at-scale SMJ shape with broadcast shimmed off")
      // the bloom probes inside a Filter on a scan side (pushdown
      // position), not above the join
      val filterLines = physical.split("\n").filter(_.contains("might_contain"))
      assert(filterLines.nonEmpty && filterLines.forall(_.contains("Filter")),
        s"might_contain not in scan-side Filter(s):\n${filterLines.mkString("\n")}")
    } finally Profiles.restore(spark, prev)
  }

  test("applyTo sets every profile conf on a live session and restore round-trips") {
    val before = Profiles.cluster().keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    val prev = Profiles.applyTo(spark, Profiles.cluster(totalCores = 800))
    try {
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "1600")
      assert(spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold") == "400MB")
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    } finally Profiles.restore(spark, prev)
    val after = Profiles.cluster().keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    assert(after == before, "restore must return the session to its prior conf")
  }
}
