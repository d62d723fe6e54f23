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

  test("ArgminScore matches the zip_with+array_min+array_position spelling on adversarial inputs") {
    // round 19: the Lloyd assignment became one fused codegen argmin
    // against a plan-time matrix; this pins it to the old higher-order
    // composition on exactly the inputs where double/null semantics
    // could drift: ties, NaN folds, ragged vectors, null elements,
    // null arrays, empty arrays, and a null-component centroid.
    val cents: IndexedSeq[IndexedSeq[java.lang.Double]] = IndexedSeq(
      IndexedSeq[java.lang.Double](1.0, 2.0),
      IndexedSeq[java.lang.Double](1.0, 2.0), // exact tie with cell 0
      IndexedSeq[java.lang.Double](-3.0, 0.5),
      IndexedSeq[java.lang.Double](null, 4.0), // null component: never assignable
      IndexedSeq[java.lang.Double](Double.PositiveInfinity, 1.0) // ∞ cc → NaN score possible
    )
    val vecs = Seq(
      Seq[java.lang.Double](1.0, 2.0),
      Seq[java.lang.Double](-3.0, 0.5),
      Seq[java.lang.Double](0.0, 0.0),
      Seq[java.lang.Double](Double.NaN, 1.0), // NaN scores everywhere
      Seq[java.lang.Double](Double.PositiveInfinity, 0.0), // ∞−∞ = NaN on one cell
      Seq[java.lang.Double](1.0), // ragged: every dot null
      Seq[java.lang.Double](1.0, null), // null element: every dot null
      Seq[java.lang.Double](), // empty
      null // null vector
    )
    val df = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .select(col("id"), col("v").cast("array<double>").as("v"))

    // the pre-round-19 spelling, over literal centroids
    def caLit(ca: IndexedSeq[java.lang.Double]) =
      array(ca.map(w =>
        if (w == null) lit(null).cast("double") else lit(w.doubleValue())): _*)
    val centsLit = array(cents.map(caLit): _*)
    val dot = graft.functions.ArrayMath.dotProduct(_, _)
    val ccsLit = transform(centsLit, ca => dot(ca, ca))
    val scores = zip_with(centsLit, ccsLit, (ca, cc) => cc - lit(2.0) * dot(col("v"), ca))
    val oldCell = (array_position(scores, array_min(scores)) - 1).cast("int")

    // the round-19 expression, built the way Kmeans.argminOf builds it
    val offsets = cents.scanLeft(0)((o, ca) => o + ca.length).toArray
    val nullCell = cents.map(_.contains(null)).toArray
    val mat = cents.flatMap(ca => ca.map(w => if (w == null) 0.0 else w.doubleValue())).toArray
    val ccs = cents.map { ca =>
      if (ca.contains(null)) 0.0
      else ca.foldLeft(0.0)((s, w) => s + w.doubleValue() * w.doubleValue())
    }.toArray
    val newCell = graft.functions.ArgminScore(col("v"), mat, offsets, ccs, nullCell)

    val rows = df.select(col("id"), oldCell.as("old"), newCell.as("new"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else Integer.valueOf(r.getInt(1)),
        if (r.isNullAt(2)) null else Integer.valueOf(r.getInt(2))))
    rows.foreach { case (id, o, n) => assert(o == n, s"vec $id: old=$o new=$n") }
    // sanity: the adversarial set actually exercises both null and
    // non-null assignments
    assert(rows.exists(_._2 == null) && rows.exists(_._2 != null))
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
