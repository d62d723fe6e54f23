package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lloyd's k-means over an embedding column, engine-deterministic.
  *
  * The clustering step behind curriculum bucketing, SemDeDup-style
  * pruning, and IVF index builds. Two design points make it
  * reproducible bit-for-bit on any engine at any parallelism — the
  * property `Dataset.ml`-style float k-means cannot offer:
  *
  *  - '''Seeds''' are the `nCells` corpus vectors with the smallest
  *    32-bit md5 id hash (the [[Ann.ivfTopKSeeded]] rule — a
  *    deterministic hash-sample that follows the data distribution).
  *  - '''Means are fixed-point.''' A grouped `sum` of doubles has no
  *    defined accumulation order, so float centroid updates differ
  *    run-to-run at scale. Components are scaled to longs
  *    (`floor(x · 2^24)`) first: integer addition is associative and
  *    commutative, so ANY accumulation order yields the same sum, and
  *    the two IEEE divisions back to a double mean are exact-rounded.
  *    Quantization error ≤ 2^-24 per component per update — noise
  *    three orders below float32 input precision.
  *
  * Assignment is argmin over `cc_c - 2·(x·c_c)` (the `|x|²` term is
  * per-row constant, so it cannot change the argmin) with ties to the
  * smallest cell index; both dot products are fixed-order left folds
  * (codegen [[graft.functions.ArrayMath.dotProduct]] / the oracle's
  * `list_reduce`), so every score double — and hence every
  * assignment — matches across engines.
  *
  * Scale shape (100 TB): centroids are a PLAN-TIME matrix (round 19,
  * the [[graft.ops.Ann.ivfTopKSeeded]] baked pattern): each
  * assignment pass is one fused argmin loop per row inside
  * whole-stage codegen ([[graft.functions.ArgminScore]]) — NO
  * broadcast pack, no per-row interpreted `zip_with` lambda, no
  * shuffle. Each update pass is one map-side-combined `(cell,
  * dim)`-keyed aggregate of long partials whose `nCells·dim` result
  * rows come back to the driver, where the division back
  * to double means runs with the exact IEEE ops the old in-plan
  * `coalesce((s/n)/Scale, w)` performed. Total: `iters + 1` corpus
  * scans, the textbook distributed-Lloyd lower bound — now with zero
  * exchanges outside the update aggregates (was: a 1-row aggregate +
  * broadcast + interpreted per-row lambdas per pass, and an eager
  * lineage checkpoint per iteration).
  *
  * DRIVER-MEMORY BOUND of the update collect (advice, r19): the
  * `nCells·dim` result comes back as boxed `Row`s — roughly 150–200 B
  * each with the four boxed fields, NOT the 16 B of the raw payload.
  * At the 65536-cell cap with dim 128 that is ~8.4M rows ≈ 1.5–2 GB of
  * transient driver heap per update pass (the raw payload is ~130 MB).
  * Size the driver for `nCells·dim·~200 B`, or keep `nCells·dim`
  * under ~10M; beyond that the pre-round-19 distributed join-based
  * update is the right shape again. The default geometries (≤ 65536
  * cells, dim ≤ a few hundred) stay comfortably inside one driver.
  *
  * PLAN-TIME BAKE CONTRACT: constructing the [[assignCells]] frame
  * eagerly runs `iters + 1` Spark jobs (seed collect + one update
  * aggregate per iteration); the final centroids are baked into the
  * returned plan as literals. They are a snapshot — re-executing the
  * frame after the source data changes reuses the construction-time
  * centroids; rebuild the frame to re-fit.
  */
object Kmeans {

  private val Scale = 16777216.0 // 2^24

  /** Position-indexed seed centroid values, collected at plan time:
    * the `nCells` smallest-md5-id corpus vectors in (hash, id) order —
    * the exact rows (and rank order) the pre-round-19 `seedArrays`
    * window assigned. Bounded: `nCells` rows. Component values stay
    * boxed so null components / null vectors keep the old per-cell
    * NULL-score semantics.
    */
  private def collectSeeds(
      base: DataFrame, idCol: String, nCells: Int): IndexedSeq[IndexedSeq[java.lang.Double]] = {
    val h = NearDup.hash32(col(idCol).cast("string"))
    base.select(col("v"), h.as("h"), col(idCol))
      .orderBy(col("h"), col(idCol)).limit(nCells)
      .select(col("v")).collect()
      .iterator.map { r =>
        if (r.isNullAt(0)) null
        else r.getSeq[Any](0).iterator
          .map(x => x.asInstanceOf[java.lang.Double]).toIndexedSeq
      }.toIndexedSeq
  }

  /** The Lloyd assignment Column for a position-indexed centroid set:
    * argmin over `cc_c − 2·dot(v, c_c)`, ties to the smallest index —
    * one fused codegen loop per row ([[graft.functions.ArgminScore]]),
    * score/ordering semantics bit-identical to the former
    * `zip_with`+`array_min`+`array_position` spelling (the squared
    * norms are the same in-order left folds, computed here with the
    * same JVM IEEE ops the in-plan `transform(cents, ca → dot(ca,
    * ca))` performed).
    */
  private def argminOf(cents: IndexedSeq[IndexedSeq[java.lang.Double]]): Column = {
    val offsets = new Array[Int](cents.length + 1)
    val nullCell = new Array[Boolean](cents.length)
    val ccs = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val ca = cents(c)
      nullCell(c) = ca == null || ca.contains(null)
      offsets(c + 1) = offsets(c) + (if (ca == null) 0 else ca.length)
      c += 1
    }
    val mat = new Array[Double](offsets.last)
    c = 0
    while (c < cents.length) {
      val ca = cents(c)
      if (!nullCell(c)) {
        var s = 0.0
        var j = 0
        while (j < ca.length) {
          val w = ca(j).doubleValue()
          mat(offsets(c) + j) = w
          s += w * w
          j += 1
        }
        ccs(c) = s
      }
      c += 1
    }
    graft.functions.ArgminScore(col("v"), mat, offsets, ccs, nullCell)
  }

  /** One Lloyd update: the `(cell, j)`-keyed fixed-point component
    * sums — the SAME map-side-combined aggregate as before, its
    * bounded (`nCells·dim`-row) result collected — then the division
    * back to double means on the driver with the identical IEEE ops
    * the in-plan `coalesce((s/n)/Scale, w)` performed. Cells that
    * lose every member keep their previous centroid; cells whose
    * stored vector is null/empty drop out and the survivors re-rank —
    * exactly the old join shape's behavior (`posexplode` of their
    * `carr` produced no rows).
    */
  private def updateCents(
      base: DataFrame,
      cents: IndexedSeq[IndexedSeq[java.lang.Double]]): IndexedSeq[IndexedSeq[java.lang.Double]] = {
    val rows = base
      .select(argminOf(cents).as("c"), posexplode(col("v")).as(Seq("j", "x")))
      .groupBy(col("c"), col("j"))
      .agg(
        sum(floor(col("x") * Scale).cast("long")).as("s"),
        count(lit(1)).as("n")
      )
      .collect()
    val sums = rows.iterator.filter(!_.isNullAt(0)).map { r =>
      (r.getInt(0), r.getInt(1)) ->
        ((if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2))), r.getLong(3))
    }.toMap
    cents.iterator.zipWithIndex
      .filter { case (ca, _) => ca != null && ca.nonEmpty }
      .map { case (ca, p) =>
        ca.iterator.zipWithIndex.map { case (w, j) =>
          sums.get((p, j)) match {
            case Some((s, n)) if s != null =>
              java.lang.Double.valueOf((s.doubleValue() / n.toDouble) / Scale)
            case _ => w
          }
        }.toIndexedSeq
      }.toIndexedSeq
  }

  /** Final assignments `(idCol, cell)` after `iters` Lloyd rounds over
    * hash-seeded centroids.
    */
  def assignCells(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      nCells: Int = 16,
      iters: Int = 2
  ): DataFrame = {
    require(nCells >= 1 && iters >= 0, s"need nCells >= 1, iters >= 0, got $nCells/$iters")
    val base = df.select(col(idCol), transform(col(vecCol), x => x.cast("double")).as("v"))
    var cents = collectSeeds(base, idCol, nCells)
    for (_ <- 0 until iters)
      cents = updateCents(base, cents)
    base.select(col(idCol), argminOf(cents).as("cell"))
  }
}
