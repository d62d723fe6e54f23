package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (per-dimension linear) embedding quantization — the standard
  * int8 compression step in front of a vector index (FAISS's SQ8,
  * Lucene/Elasticsearch scalar quantization): a 100 TB embedding
  * corpus is 4× smaller and ANN distance kernels get integer SIMD.
  *
  * `code(j) = floor((x_j - min_j) · (2^bits - 1) / (max_j - min_j))`,
  * clamped to [0, 2^bits - 1]; `min_j`/`max_j` are corpus-wide
  * per-dimension extrema. All arithmetic is IEEE double in a fixed
  * operation order, so an independent engine (the DuckDB oracle)
  * reproduces every code bit-for-bit.
  *
  * Scale posture (100 TB): the corpus NEVER shuffles. Pass 1 computes
  * the per-dimension extrema by explode → 64-row aggregate (map-side
  * combined; the shuffle moves nDims×nPartitions partial rows, not
  * data). Pass 2 broadcasts the extrema back as two array literals via
  * a 1-row cross join and quantizes inside a `transform` projection —
  * a narrow map over the scan. The per-element lambda is interpreted
  * (Spark evaluates higher-order functions row-by-row), but it is two
  * subtractions, a multiply, and a divide per component — the
  * shuffle-free shape wins over a codegen groupBy re-assembly that
  * would move the whole corpus.
  */
object Quantize {

  /** Per-dimension `(pos, mn, mx)` extrema of `vecCol` (nDims rows). */
  private def extrema(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))

  /** The extrema as position-ordered PLAN-TIME literal arrays (round
    * 19): nDims rows are a bounded constant (the IVF-centroid
    * precedent), so collecting them replaces the former 1-row
    * aggregate + broadcast-nested-loop cross join with two literal
    * array columns — same values (the identical min/max aggregate
    * computes them, as a plan-time job), two fewer driver jobs, no
    * join in the plan. Null extrema (a dimension whose every value is
    * null) stay null via the boxed element type, exactly as the old
    * collect_list structs carried them.
    */
  private def extremaLiterals(df: DataFrame, vecCol: String): (Column, Column) = {
    val rows = extrema(df, vecCol).collect()
    val byPos = rows.map(r => (r.getInt(0),
      (if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1)),
        if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2))))).sortBy(_._1)
    def arr(vs: Array[java.lang.Double]): Column =
      if (vs.isEmpty) array().cast("array<double>")
      else array(vs.map(v =>
        if (v == null) lit(null).cast("double") else lit(v.doubleValue())): _*)
    (arr(byPos.map(_._2._1)), arr(byPos.map(_._2._2)))
  }

  private def codeExpr(x: Column, mn: Column, mx: Column, levels: Int): Column = {
    // fixed order: (x - mn) * (levels - 1), THEN / (mx - mn) — the
    // oracle spells the identical order so the doubles match exactly.
    // Constant dimension (mx == mn) → 0; clamp covers float edge drift.
    val raw = floor((x.cast("double") - mn) * lit((levels - 1).toDouble) / (mx - mn))
    least(greatest(when(mx === mn, lit(0.0)).otherwise(raw), lit(0.0)), lit((levels - 1).toDouble))
      .cast("int")
  }

  /** Quantized corpus, one row per (vector, dimension):
    * `(idCol, pos, code)` with `code ∈ [0, 2^bits - 1]`. The exploded
    * shape is the oracle-friendly projection of [[quantizeVectors]];
    * both share the same two-pass plan.
    *
    * PLAN-TIME BAKE CONTRACT (both public forms): constructing the
    * frame eagerly runs one Spark job — the per-dimension extrema
    * aggregate — and bakes the codebook as literals. The codebook is a
    * snapshot: re-executing the frame after the source data changes
    * quantizes against the construction-time extrema; rebuild the
    * frame to re-fit them.
    */
  def quantizeCodes(df: DataFrame, vecCol: String, idCol: String, bits: Int = 8): DataFrame = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1, 16], got $bits")
    val levels = 1 << bits
    val (mns, mxs) = extremaLiterals(df, vecCol)
    df.select(col(idCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(
        col(idCol),
        col("pos").cast("int").as("pos"),
        codeExpr(col("x"), element_at(mns, col("pos") + 1),
          element_at(mxs, col("pos") + 1), levels).as("code")
      )
  }

  /** Quantized corpus in array form: `(idCol, codes array<int>)` plus
    * the codebook columns (`mns`, `mxs`) carried on every row for
    * downstream dequantization — a narrow map over the scan, zero
    * corpus shuffle.
    */
  def quantizeVectors(df: DataFrame, vecCol: String, idCol: String, bits: Int = 8): DataFrame = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1, 16], got $bits")
    val levels = 1 << bits
    val (mns, mxs) = extremaLiterals(df, vecCol)
    df.select(
      col(idCol),
      transform(col(vecCol), (x, i) =>
        codeExpr(x, element_at(mns, i + 1), element_at(mxs, i + 1), levels)
      ).as("codes"),
      mns.as("mns"), mxs.as("mxs")
    )
  }

  /** Reconstruction: code → the CENTER of its quantization cell.
    * The encode scale divides the range into `levels - 1`-width cells
    * (`floor((x - mn)·(levels-1)/range)`), so the cell for code c is
    * `[mn + c·range/(levels-1), mn + (c+1)·range/(levels-1))` and its
    * center `mn + (c + 0.5)·range/(levels-1)` — worst-case error
    * range/(2·(levels-1)). Input shape = [[quantizeVectors]] output.
    */
  def dequantizeVectors(df: DataFrame, codesCol: String = "codes", bits: Int = 8): DataFrame = {
    val levels = 1 << bits
    df.withColumn("approx",
      transform(col(codesCol), (c, i) => {
        val mn = element_at(col("mns"), i + 1)
        val mx = element_at(col("mxs"), i + 1)
        mn + (c.cast("double") + lit(0.5)) * (mx - mn) / lit((levels - 1).toDouble)
      }))
  }
}
