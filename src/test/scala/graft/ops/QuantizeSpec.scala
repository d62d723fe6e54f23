package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Scalar quantization contract: exact codes on known extrema, clamped
  * range, bounded reconstruction error, and the shuffle-free plan shape
  * (the corpus side must reach the quantizing projection without a
  * hash-partitioning exchange — only the 64-row extrema aggregate and
  * its 1-row broadcast may shuffle).
  */
class QuantizeSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  private lazy val vecs: DataFrame = Seq(
    (0L, Array(0.0f, 10.0f, 3.0f)),
    (1L, Array(5.0f, 10.0f, 3.0f)),
    (2L, Array(10.0f, 0.0f, 3.0f))
  ).toDF("vec_id", "embedding")

  test("codes hit exact endpoints and floor midpoints; constant dims code to 0") {
    val m = Quantize.quantizeCodes(vecs, "embedding", "vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    // dim 0: range [0, 10] → 0, floor(5·255/10) = 127, 255
    assert(m((0L, 0)) == 0 && m((1L, 0)) == 127 && m((2L, 0)) == 255)
    // dim 1: 10 → 255, 0 → 0
    assert(m((0L, 1)) == 255 && m((2L, 1)) == 0)
    // dim 2 is constant → 0 everywhere, no divide-by-zero
    assert(Seq(0L, 1L, 2L).forall(id => m((id, 2)) == 0))
  }

  test("array form matches exploded form; codes stay in [0, 255]") {
    val codes = Quantize.quantizeVectors(vecs, "embedding", "vec_id")
      .select("vec_id", "codes").as[(Long, Array[Int])].collect().toMap
    val exploded = Quantize.quantizeCodes(vecs, "embedding", "vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    for ((id, arr) <- codes; (c, j) <- arr.zipWithIndex) {
      assert(c >= 0 && c <= 255)
      assert(c == exploded((id, j)))
    }
  }

  test("dequantize reconstruction error is bounded by half a cell") {
    val q = Quantize.quantizeVectors(vecs, "embedding", "vec_id")
    val approx = Quantize.dequantizeVectors(q)
      .select("vec_id", "approx").as[(Long, Array[Double])].collect().toMap
    val orig = vecs.as[(Long, Array[Float])].collect().toMap
    // per-dim ranges are 10, 10, 0 → worst-case error 10/510 (+ eps)
    for ((id, xs) <- orig; (x, j) <- xs.zipWithIndex)
      assert(math.abs(x - approx(id)(j)) <= 10.0 / 510.0 + 1e-9,
        s"vec $id dim $j: ${x} vs ${approx(id)(j)}")
  }

  test("plan: corpus never shuffles; extrema are plan-time literals — no join at all") {
    val df = Quantize.quantizeCodes(vecs, "embedding", "vec_id")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // round 19: the nDims-row extrema are collected at plan time and
    // baked as literal arrays — the former 1-row broadcast cross join
    // is gone; the quantization pass is a joinless, exchange-free
    // projection over the scan
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange"), plan)
  }
}
