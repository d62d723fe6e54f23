package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  * Scale shape (100 TB): centroids live in ONE broadcast row of
  * nested arrays (`nCells × dim` doubles); each assignment pass is a
  * narrow per-row projection — `nCells` dots + an array argmin, NO
  * shuffle, no per-row window. Each update pass is one
  * map-side-combined `(cell, dim)`-keyed aggregate of long partials
  * (`nCells·dim` result rows). Total: `iters + 1` corpus scans, the
  * textbook distributed-Lloyd lower bound.
  */
object Kmeans {

  private val Scale = 16777216.0 // 2^24

  private def dot(a: Column, b: Column): Column =
    graft.functions.ArrayMath.dotProduct(a, b)

  /** `(c, carr)` seed centroids: the `nCells` smallest-md5-id corpus
    * vectors, cell index = rank in that tiny ordered set.
    */
  private def seedArrays(
      base: DataFrame, idCol: String, nCells: Int): DataFrame = {
    val h = NearDup.hash32(col(idCol).cast("string"))
    base.select(col(idCol), col("v"), h.as("h"))
      .orderBy(col("h"), col(idCol)).limit(nCells)
      .withColumn("c",
        (row_number().over(Window.orderBy(col("h"), col(idCol))) - 1).cast("int"))
      .select(col("c"), col("v").as("carr"))
  }

  /** One broadcastable row: `cents` = the centroid arrays in cell
    * order, `ccs` = their squared norms (fixed-order folds).
    */
  private def packed(centArr: DataFrame): DataFrame =
    centArr
      .agg(transform(array_sort(collect_list(struct(col("c"), col("carr")))),
        _.getField("carr")).as("cents"))
      .select(col("cents"),
        transform(col("cents"), ca => dot(ca, ca)).as("ccs"))

  /** `(idCol, v, cell)`: nearest centroid per row — a narrow
    * projection against the one-row broadcast, zero shuffle.
    */
  private def assign(base: DataFrame, idCol: String, centArr: DataFrame): DataFrame =
    base.crossJoin(broadcast(packed(centArr)))
      .withColumn("scores",
        zip_with(col("cents"), col("ccs"), (ca, cc) => cc - lit(2.0) * dot(col("v"), ca)))
      .select(col(idCol), col("v"),
        (array_position(col("scores"), array_min(col("scores"))) - 1).cast("int").as("cell"))

  /** Lloyd update: fixed-point component means keyed `(cell, j)`;
    * cells that lose every member keep their previous centroid.
    */
  private def update(assigned: DataFrame, idCol: String, centArr: DataFrame): DataFrame = {
    val sums = assigned
      .select(col("cell").as("c"), posexplode(col("v")).as(Seq("j", "x")))
      .groupBy(col("c"), col("j"))
      .agg(
        sum(floor(col("x") * Scale).cast("long")).as("s"),
        count(lit(1)).as("n")
      )
    val oldComp = centArr.select(col("c"), posexplode(col("carr")).as(Seq("j", "w")))
    oldComp.join(sums, Seq("c", "j"), "left")
      .select(col("c"), col("j"),
        coalesce((col("s").cast("double") / col("n").cast("double")) / Scale, col("w")).as("w"))
      .groupBy(col("c"))
      .agg(transform(array_sort(collect_list(struct(col("j"), col("w")))),
        _.getField("w")).as("carr"))
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
    var cent = seedArrays(base, idCol, nCells)
    for (_ <- 0 until iters)
      cent = update(assign(base, idCol, cent), idCol, cent).localCheckpoint()
    assign(base, idCol, cent).select(col(idCol), col("cell"))
  }
}
