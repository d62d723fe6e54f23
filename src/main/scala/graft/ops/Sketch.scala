package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketches.
  *
  * HyperLogLog answers "how many distinct tokens/urls/ids" without a
  * global distinct, but no two engines agree on an HLL's exact
  * estimate (register layout and bias correction are
  * implementation-defined). The K-MINIMUM-VALUES estimator is the
  * engine-exact alternative: the k-th smallest distinct hash value
  * h(k) over a uniform 2^32 hash space estimates cardinality as
  * `(k-1) · 2^32 / h(k)` — every term is reproducible integer/IEEE
  * arithmetic, so ANY engine computes the identical estimate
  * (relative error ~1/√(k−2), ≈6% at k=256).
  *
  * Scale shape: the only shuffle carries 8-byte DISTINCT HASHES (never
  * token strings); the k-smallest cut is `TakeOrderedAndProject`
  * (per-partition heaps, driver-side merge of k·partitions longs). A
  * 100 TB refinement — per-partition bottom-k BEFORE the distinct
  * exchange — bounds the shuffle at k rows per partition; at that
  * point the estimator's input is identical (bottom-k of a union =
  * bottom-k of per-partition bottom-ks).
  */
object Sketch {

  /** One-row corpus summary:
    * `(k, kth_hash, est_distinct, exact_distinct)` — the KMV estimate
    * of the number of distinct normalized tokens next to the exact
    * count (the exact side is the expensive global distinct the sketch
    * exists to replace; carried here so the estimate's accuracy is
    * visible in the output itself). The estimator needs ≥ k distinct
    * token hashes and a strictly positive k-th hash (k=256 vs any real
    * corpus's ≥10⁴ tokens); a degenerate corpus yields
    * `est_distinct = NULL` rather than a silently biased number or a
    * divide-by-zero.
    */
  def distinctTokensKmv(df: DataFrame, textCol: String, k: Int = 256): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val toks = df
      .select(explode(NearDup.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
    val kth = toks
      .select(NearDup.hash32(col("tok")).as("h"))
      .distinct()
      .orderBy(col("h"))
      .limit(k)
      // n_in_k counts the rows the limit actually produced: < k means
      // the corpus has fewer than k distinct hashes and max(h) is NOT
      // the k-th minimum — the estimate would be biased low.
      .agg(max(col("h")).as("kth_hash"), count(lit(1)).as("__n_in_k"))
    val exact = toks.agg(countDistinct(col("tok")).as("exact_distinct"))
    kth.crossJoin(exact).select(
      lit(k).as("k"),
      col("kth_hash"),
      when(col("__n_in_k") === k && col("kth_hash") > 0,
        lit((k - 1).toDouble) * lit(4294967296.0) / col("kth_hash").cast("double"))
        .as("est_distinct"),
      col("exact_distinct")
    )
  }
}
