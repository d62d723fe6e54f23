package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Salted-join contract: identical results to a plain equi-join, with
  * the salt as part of the shuffle key so a hot key spreads across
  * partitions.
  */
class SkewSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  // 10k rows, 95% on one hot key — the classic skew shape.
  private lazy val large = (1 to 10000)
    .map(i => (if (i % 20 == 0) i.toLong % 7 else 42L, s"payload_$i"))
    .toDF("k", "payload")
  private lazy val small = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c")).toDF("k2", "name")

  test("salted join returns exactly the plain join's rows") {
    val plain = large.join(small, large("k") === small("k2")).select("k", "payload", "name")
    val salted = Skew.saltedJoin(large, small, "k", "k2", nSalts = 8).select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("left join keeps unmatched large rows exactly once") {
    val plain = large.join(small, large("k") === small("k2"), "left").select("k", "payload", "name")
    val salted = Skew.saltedJoin(large, small, "k", "k2", nSalts = 8, joinType = "left")
      .select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("a shuffled salted join partitions on (key, salt): no single hot-key partition") {
    // force the sort-merge path (broadcast would elide the shuffle and
    // hide the property this operator exists for)
    val salted = Skew.saltedJoin(large.hint("merge"), small, "k", "k2", nSalts = 8)
    salted.collect()
    val exchanges = salted.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, "expected a shuffle in the forced sort-merge plan")
    // every shuffle carries the salt, so partition size is bounded by
    // (hot-key rows / nSalts), not by the hot key's full mass
    assert(exchanges.forall(_.contains("__salt")), exchanges.mkString("\n"))
  }

  test("the salt reaches the join key (hot key spreads across buckets)") {
    val salted = Skew.saltedJoin(large, small, "k", "k2", nSalts = 8)
    val plan = salted.queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), plan)
    // a deterministic hash salt spreads the hot key over multiple buckets
    val buckets = large
      .withColumn("__salt", pmod(xxhash64(struct(large.columns.map(col): _*)), lit(8)).cast("int"))
      .filter($"k" === 42L).select("__salt").distinct().count()
    assert(buckets > 4, s"hot key only hit $buckets of 8 salt buckets")
  }
}
