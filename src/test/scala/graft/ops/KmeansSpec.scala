package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class KmeansSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  // 3 well-separated Gaussian blobs in 8 dims
  private def blobs(n: Int, seed: Long) = {
    val r = new scala.util.Random(seed)
    (0 until n).map { i =>
      val center = i % 3 match {
        case 0 => Array.fill(8)(0.0f)
        case 1 => Array.fill(8)(5.0f)
        case _ => Array(5.0f, -5.0f, 5.0f, -5.0f, 5.0f, -5.0f, 5.0f, -5.0f)
      }
      (i.toLong, center.map(c => c + (r.nextGaussian() * 0.3).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("assignments are deterministic under partitioning and in range") {
    val df = blobs(300, seed = 5)
    val a = Kmeans.assignCells(df, "embedding", "vec_id", nCells = 4, iters = 2)
      .as[(Long, Int)].collect().toMap
    val b = Kmeans.assignCells(df.repartition(11), "embedding", "vec_id", nCells = 4, iters = 2)
      .as[(Long, Int)].collect().toMap
    assert(a == b)
    assert(a.values.forall(c => c >= 0 && c < 4))
    assert(a.size == 300)
  }

  test("Lloyd iterations separate well-separated blobs into pure cells") {
    val df = blobs(300, seed = 9)
    val out = Kmeans.assignCells(df, "embedding", "vec_id", nCells = 3, iters = 3)
      .as[(Long, Int)].collect()
    // every ground-truth blob (vec_id % 3) maps to exactly one cell
    val byBlob = out.groupBy { case (id, _) => id % 3 }.map { case (blob, xs) =>
      blob -> xs.map(_._2).distinct
    }
    assert(byBlob.values.forall(_.length == 1), byBlob)
    assert(byBlob.values.flatten.toSet.size == 3, byBlob)
  }

  test("iters=0 equals plain seeded Voronoi assignment and refinement reduces SSE") {
    val df = blobs(240, seed = 13)
    val vecs = df.as[(Long, Array[Float])].collect().toMap
      .map { case (k, v) => k -> v.map(_.toDouble) }
    def sse(assign: Map[Long, Int]): Double = {
      val cents = assign.groupBy(_._2).map { case (c, m) =>
        val vs = m.keys.toSeq.map(vecs)
        c -> vs.transpose.map(col => col.sum / col.size).toArray
      }
      assign.map { case (id, c) =>
        vecs(id).zip(cents(c)).map { case (x, w) => (x - w) * (x - w) }.sum
      }.sum
    }
    val a0 = Kmeans.assignCells(df, "embedding", "vec_id", nCells = 5, iters = 0)
      .as[(Long, Int)].collect().toMap
    val a3 = Kmeans.assignCells(df, "embedding", "vec_id", nCells = 5, iters = 3)
      .as[(Long, Int)].collect().toMap
    assert(sse(a3) <= sse(a0) + 1e-9, s"SSE ${sse(a3)} vs ${sse(a0)}")
  }
}
