package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ProjectSpec extends SparkTestBase {
  import SparkTestBase.spark.implicits._

  private def randVecs(n: Int, dim: Int, seed: Long) = {
    val r = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)((r.nextDouble() - 0.5).toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("planeValue mirrors NearDup.planeComponent bit-for-bit") {
    val idx = spark.range(200000).select(col("id"))
    val mismatches = idx.select(
      col("id"),
      graft.ops.NearDup.planeComponent(col("id")).as("c")
    ).as[(Long, Double)].collect()
      .count { case (i, c) => c != Project.planeValue(i) }
    assert(mismatches == 0)
  }

  test("random projection approximately preserves pairwise distance ratios (JL)") {
    val df = randVecs(80, 64, seed = 7)
    val proj = Project.randomProjectVectors(df, "embedding", "vec_id", dim = 64, outDim = 16)
      .as[(Long, Array[Double])].collect().toMap
    val orig = df.as[(Long, Array[Float])].collect().toMap
      .map { case (k, v) => k -> v.map(_.toDouble) }
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- 0L until 80L; j <- (i + 1) until 80L
    } yield d2(proj(i), proj(j)) / d2(orig(i), orig(j))
    // E[ratio] = 1 under the 1/sqrt(outDim) scale with Var[w]=1/12
    // planes... components are uniform[-0.5,0.5) (variance 1/12), so
    // E[||Px||^2] = outDim * (1/12) * ||x||^2 / outDim = ||x||^2 / 12.
    val mean = ratios.sum / ratios.size
    assert(mean > 1.0 / 12 * 0.7 && mean < 1.0 / 12 * 1.3, s"mean distance ratio $mean")
    // and the spread is sketch-like, not degenerate
    assert(ratios.count(r => r > mean * 0.2 && r < mean * 3.0) > ratios.size * 0.9)
  }

  test("projection plan is a narrow shuffle-free scan") {
    val df = randVecs(10, 64, seed = 3)
    val plan = Project.randomProjectCodes(df, "embedding", "vec_id", 64, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("exploded codes match array form") {
    val df = randVecs(12, 64, seed = 11)
    val arr = Project.randomProjectVectors(df, "embedding", "vec_id", 64, 16)
      .as[(Long, Array[Double])].collect().toMap
    val codes = Project.randomProjectCodes(df, "embedding", "vec_id", 64, 16)
      .as[(Long, Int, Double)].collect()
    assert(codes.length == 12 * 16)
    assert(codes.forall { case (id, p, y) => arr(id)(p) == y })
  }
}
