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

  test("PackedSignSig == independent driver-side recomputation for every geometry in use") {
    for (planes <- Seq(4, 21, 32, 56, 62)) {
      val viaExpr = NearDup.signSigs(vecs, "embedding", "vec_id", dim = 8, planes = planes)
        .select($"vec_id", $"sig", $"nrm")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val raw = vecs.collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble))).toMap
      for ((id, v) <- raw) {
        var sig = 0L
        for (p <- 0 until planes) {
          var s = 0.0
          for (j <- 0 until 8) s += v(j) * Project.planeValue(p.toLong * 8 + j)
          if (s >= 0) sig |= 1L << p
        }
        val nrm = math.sqrt(v.map(x => x * x).sum)
        assert(viaExpr(id)._1 == sig, s"planes=$planes id=$id")
        assert(viaExpr(id)._2 == nrm, s"planes=$planes id=$id nrm")
      }
    }
  }

  test("PackedSignSig null semantics: short vector or null component -> all bits clear") {
    import graft.functions.PackedSignSig
    val m = Array(1.0, 1.0, -1.0, -1.0) // 2 planes, dim 2
    assert(PackedSignSig.compute(ArrayData.toArrayData(Array(1.0, 2.0)), m, 2) == 1L)
    assert(PackedSignSig.compute(ArrayData.toArrayData(Array(1.0)), m, 2) == 0L) // short
    assert(PackedSignSig.compute(
      ArrayData.toArrayData(Array[java.lang.Double](1.0, null)), m, 2) == 0L)    // null component
  }

  test("ArgmaxDotDyn (runtime matrix, the SQL-text spelling) == ArgmaxDot on every edge") {
    import graft.functions.ArgmaxDot.{compute, computeDyn}
    // the dyn spelling takes the seed SET (array of vectors); chop the
    // flat row-major fixture matrices into dim-sized rows
    def ad(m: Array[Double], dim: Int): ArrayData =
      ArrayData.toArrayData(m.grouped(dim).map(ArrayData.toArrayData(_)).toArray[Any])
    val cases = Seq(
      // (vector, matrix, dim)
      (Array[java.lang.Double](1.0, 0.0), Array(2.0, 0.0, 2.0, 0.0), 2),        // exact tie
      (Array[java.lang.Double](1.0, 0.0), Array(1.0, 0.0, Double.NaN, 0.0), 2), // NaN largest
      (Array[java.lang.Double](1.0, 0.0, 9.0), Array(0.5, 0.0, 1.0, 0.0), 2),   // ragged long
      (Array[java.lang.Double](1.0), Array(0.5, 3.0, 1.0, -3.0), 2),            // ragged short
      (Array[java.lang.Double](1.0, null), Array(0.5, 3.0, 1.0, -3.0), 2),      // null element skipped
      (Array.empty[java.lang.Double], Array(1.0), 1),                           // empty vector
      (Array[java.lang.Double](1.0, 0.0), Array.empty[Double], 2),              // empty matrix
      // zero-dot tie across signed weights (both fold to +0.0 — IEEE
      // `0.0 + -0.0`; the tie must break to the smaller c in both)
      (Array[java.lang.Double](0.0, 1.0), Array(-0.5, 0.0, 0.5, 0.0), 2)
    )
    for ((v, m, dim) <- cases) {
      val vd = ArrayData.toArrayData(v)
      assert(computeDyn(vd, ad(m, dim)) == compute(vd, m, dim),
        s"v=${v.mkString(",")} m=${m.mkString(",")} dim=$dim")
    }
    // null seed component: the plan path rejects at compile time, the
    // dynamic spelling at eval time — same message; ragged seeds too
    val e = intercept[IllegalArgumentException](computeDyn(
      ArrayData.toArrayData(Array(1.0, 2.0)),
      ArrayData.toArrayData(Array[Any](
        ArrayData.toArrayData(Array[java.lang.Double](1.0, null))))))
    assert(e.getMessage.contains("null components"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](computeDyn(
      ArrayData.toArrayData(Array(1.0, 2.0)),
      ArrayData.toArrayData(Array[Any](
        ArrayData.toArrayData(Array(1.0, 2.0)), ArrayData.toArrayData(Array(1.0))))))
    assert(e2.getMessage.contains("ragged seed vectors"), e2.getMessage)
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
