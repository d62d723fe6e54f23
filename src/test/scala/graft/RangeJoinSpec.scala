package graft

import java.sql.Timestamp

import graft.ops.RangeJoin

class RangeJoinSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  private lazy val points = Seq(
    ("A", ts(5), 1L),
    ("A", ts(15), 2L),
    ("A", ts(30), 3L), // boundary: interval i1 ends (exclusive) at 30
    ("B", ts(5), 4L)
  ).toDF("key", "ts", "pid")

  private lazy val intervals = Seq(
    ("A", ts(0), ts(30), "i1"),
    ("A", ts(10), ts(20), "i2"), // overlaps i1 → point 2 matches both
    ("B", ts(6), ts(10), "i3") // starts after B's point
  ).toDF("key", "s", "e", "iid")

  private val bucket = 10L * 60 * 1000 * 1000 // 10 minutes in µs

  test("point-in-interval matches, half-open bounds, overlapping intervals") {
    val got = RangeJoin.pointInInterval(points, intervals, Seq("key"), "ts", "s", "e", bucket)
      .select("pid", "iid").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "i1"), (2L, "i1"), (2L, "i2")))
    // pid 3 at ts=30 excluded (end exclusive); pid 4 before i3 starts
  }

  test("each match appears exactly once (single-bucket membership, no dedup pass)") {
    val got = RangeJoin.pointInInterval(points, intervals, Seq("key"), "ts", "s", "e", bucket)
      .select("pid", "iid").as[(Long, String)].collect()
    assert(got.length == got.toSet.size)
  }

  test("plan is an equi-join on (key, bucket) — no nested-loop range probe") {
    val df = RangeJoin.pointInInterval(points, intervals, Seq("key"), "ts", "s", "e", bucket)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("__bucket"), plan) // the equi-key actually used
  }
}
