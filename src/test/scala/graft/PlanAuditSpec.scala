package graft

import org.apache.spark.sql.DataFrame

import graft.sources.Tables

/** Physical-plan audits over real parquet (sf0.001): the properties
  * that keep compiled queries efficient at 100 TB.
  *
  *   - filters reach the parquet scan (`PushedFilters` non-empty);
  *   - `sort | take` plans as TakeOrderedAndProject (O(N) heap, no
  *     full sort);
  *   - star joins broadcast the small dimension side.
  */
class PlanAuditSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val cat = Tables.parquetDir(spark, sfDir)

  private def plans(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("where over parquet pushes the comparison into the scan") {
    val df = Pql.query(spark, "lineitem | where l_quantity > 45 | project l_orderkey, l_quantity", cat)
    val plan = plans(df)
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("GreaterThan(l_quantity"), plan)
  }

  test("null-safe == with literal pushes an equality filter") {
    val df = Pql.query(spark, """lineitem | where l_returnflag == "R" | project l_orderkey""", cat)
    val plan = plans(df)
    // literal RHS compiles to a pushdown-friendly form, not coalesce(...)
    assert(plan.contains("l_returnflag"), plan)
    assert(plan.contains("PushedFilters: [") && !plan.matches("(?s).*PushedFilters: \\[\\].*"), plan)
  }

  test("projection prunes the parquet read schema") {
    val df = Pql.query(spark, "lineitem | project l_orderkey, l_quantity", cat)
    val plan = plans(df)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"), plan)
    assert(!readSchema.contains("l_comment"), plan)
  }

  test("sort | take plans as TakeOrderedAndProject") {
    val df = Pql.query(spark, "customer | sort by c_acctbal | take 10 | project c_custkey", cat)
    assert(plans(df).contains("TakeOrderedAndProject"), plans(df))
  }

  test("top N by x plans as TakeOrderedAndProject") {
    val df = Pql.query(spark, "orders | top 5 by o_totalprice | project o_orderkey", cat)
    assert(plans(df).contains("TakeOrderedAndProject"), plans(df))
  }

  test("q1_agg: partial aggregation before a single exchange, filter pushed") {
    val plan = plans(SparkEntry.queries("q1_agg")(spark, sfDir))
    // AQE prints Final and Initial plans; audit the final one only
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("partial_sum"), plan)
    assert(finalPlan.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 1, plan)
    assert(finalPlan.contains("PushedFilters: [IsNotNull(l_shipdate)"), plan)
  }

  test("q3_shipping: top 10 by revenue is TakeOrderedAndProject, joins broadcast") {
    val plan = plans(SparkEntry.queries("q3_shipping")(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q5_local: 5-way star join has no cartesian product and prunes scans") {
    val df = SparkEntry.queries("q5_local")(spark, sfDir)
    val plan = plans(df)
    assert(!plan.contains("CartesianProduct"), plan)
    // lineitem scan reads only the join key + money columns
    val lineitemScan = plan.linesIterator.find(l => l.contains("ReadSchema") && l.contains("l_orderkey")).getOrElse("")
    assert(!lineitemScan.contains("l_comment"), plan)
  }

  test("star join broadcasts the small dimension side") {
    val df = Pql.query(
      spark,
      """orders | join kind=inner (customer) on $left.o_custkey == $right.c_custkey
        | | summarize n = count() by c_mktsegment""".stripMargin,
      cat
    )
    assert(plans(df).contains("BroadcastHashJoin"), plans(df))
  }

  test("asof_join_tolerant: skew-split window fill, no range probing") {
    val plan = plans(SparkEntry.queries("asof_join_tolerant")(spark, sfDir))
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the fill window partitions on (key, __bucket): a hot key's sort
    // is split across timeBuckets tasks instead of one
    assert(plan.contains("Window"), plan)
    assert(plan.contains("__bucket"), plan)
    // nested-loop joins appear ONLY as the 1-row bounds broadcast
    // (Cross build) — never as a per-row range probe
    val bnlj = "BroadcastNestedLoopJoin BuildRight, (\\w+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(bnlj.forall(_ == "Cross"), plan)
  }

  test("skew_join gate entry joins with no cartesian and carries the salt") {
    val plan = plans(SparkEntry.queries("skew_join")(spark, sfDir))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("__salt"), plan)
  }

  test("corpus_build: the composed pipeline keeps every stage's shape") {
    val plan = plans(SparkEntry.queries("corpus_build")(spark, sfDir))
    assert(!plan.contains("CartesianProduct"), plan)
    // quality filter runs as a filter, not a join against a scored copy
    assert(plan.contains("graft_punct_count"), plan) // codegen quality counts
    assert(plan.contains("Window"), plan)            // pack cumsum
  }

  test("pack_concat aggregates per sequence with no cartesian") {
    val plan = plans(SparkEntry.queries("pack_concat")(spark, sfDir))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate") ||
      plan.contains("HashAggregate"), plan)
  }

  test("text_lm_score: model joins broadcast, shingles stay codegen, no cartesian") {
    val plan = plans(SparkEntry.queries("text_lm_score")(spark, sfDir))
    // round 19: the top-K model is collected at plan time (bounded by
    // construction) and baked into one codegen loop per row — the
    // corpus side is a joinless, exchange-free, aggregate-free
    // projection (the model cut itself runs as a plan-time job)
    assert(plan.contains("graft_lm_bigram_stats"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("text_classifier_score: baked weights, one fused projection — no join, no exchange") {
    val plan = plans(SparkEntry.queries("text_classifier_score")(spark, sfDir))
    // round 19: the integer logit accumulation fuses row-locally
    // against the plan-time weight vector
    assert(plan.contains("graft_classifier_acc"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("kmeans_assign: baked argmin projection — no join, no exchange") {
    val plan = plans(SparkEntry.queries("kmeans_assign")(spark, sfDir))
    // round 19: the final assignment pass is one fused codegen argmin
    // per row against the plan-time centroid matrix — the per-pass
    // broadcast pack, nested-loop join, and interpreted zip_with are
    // gone (the Lloyd updates run as bounded plan-time aggregates)
    assert(plan.contains("graft_argmin_score"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("mixture_sample is a shuffle-free narrow projection") {
    val plan = plans(SparkEntry.queries("mixture_sample")(spark, sfDir))
    assert(!plan.contains("Exchange"), plan)
  }

  test("dedup_substrings: no cartesian, spans flow through hash-keyed windows") {
    val plan = plans(SparkEntry.queries("dedup_substrings")(spark, sfDir))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Window"), plan)
    assert(plan.contains("graft_shingle_hashes"), plan)
  }
}
