package graft.ops

import org.apache.spark.sql.catalyst.util.ArrayData

import graft.SparkTestBase
import graft.functions.ArgmaxDot

/** [[graft.functions.ArgmaxDot]] (the baked plan-time-matrix cell
  * assignment) must reproduce [[Ann.cellRanks]]' `r = 1` winner
  * EXACTLY — SemDedup swapped the join/window shape for it (round 12),
  * so any divergence silently changes which cell bounds the quadratic
  * pair work.
  */
class CellAssignSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  private lazy val vecs = {
    val rows = (0 until 10).map { i =>
      val base = (0 until 8).map(j => math.sin(0.7 * (i % 5) + 0.3 * j).toFloat)
      val jitter = if (i < 5) 0.0f else 0.01f
      (i.toLong, base.map(x => x + jitter).toArray)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("baked assignment == cellRanks r=1 on the fixture") {
    val nCells = 4
    val centroids = Ann.seededCentroids(vecs, "embedding", "vec_id", nCells)
    val viaWindow = Ann.cellRanks(vecs, "embedding", "vec_id", "vec_id", centroids)
      .filter($"r" === 1).select($"vec_id", $"c".cast("int").as("c"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val (mat, mDim) = Ann.seededCentroidMatrix(vecs, "embedding", "vec_id", nCells)
    val viaBaked = vecs
      .select($"vec_id", ArgmaxDot($"embedding".cast("array<double>"), mat, mDim).as("c"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(viaBaked == viaWindow && viaBaked.size == 10)
  }

  test("tie goes to the smallest c; NaN ranks largest; empty vector/matrix -> no assignment") {
    val v = ArrayData.toArrayData(Array(1.0, 0.0))
    assert(ArgmaxDot.compute(v, Array(2.0, 0.0, 2.0, 0.0), 2) == 0)
    assert(ArgmaxDot.compute(v, Array(1.0, 0.0, Double.NaN, 0.0), 2) == 1)
    assert(ArgmaxDot.compute(ArrayData.toArrayData(Array.empty[Double]), Array(1.0), 1) == -1)
    assert(ArgmaxDot.compute(v, Array.empty[Double], 2) == -1)
    // vector longer than dim: fold over the shared prefix (the
    // dimension-join semantics of the window shape)
    assert(ArgmaxDot.compute(ArrayData.toArrayData(Array(1.0, 0.0, 9.0)), Array(0.5, 0.0, 1.0, 0.0), 2) == 1)
  }
}
