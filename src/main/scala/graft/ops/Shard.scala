package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-shard assignment and manifest.
  *
  * The last step of a corpus build: spread documents over `nShards`
  * output shards deterministically (same doc → same shard on every
  * run/engine) and emit the per-shard manifest — doc count, token
  * total, byte total — that the training job reads to plan epochs.
  * Shard membership is `hash32(id) mod nShards`, so shards are
  * hash-balanced regardless of input order or skew in any natural key
  * (the same portable md5 hash every sampling op uses).
  *
  * Scale shape: assignment is a narrow projection; the manifest is ONE
  * map-side-combined aggregate of `nShards` result rows. Writing the
  * actual shards is `df.write.partitionBy("shard")` downstream —
  * no shuffle beyond the writer's own.
  */
object Shard {

  private def shardOf(id: Column, nShards: Int): Column =
    pmod(NearDup.hash32(id.cast("string")), lit(nShards.toLong)).cast("int")

  /** Input rows plus their `shard` assignment (narrow, no shuffle). */
  def assign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    df.withColumn("shard", shardOf(col(idCol), nShards))
  }

  /** Per-shard manifest: `(shard, n_docs, n_tokens, n_bytes)` —
    * whitespace-token and UTF-8 byte totals per shard.
    */
  def manifest(df: DataFrame, textCol: String, idCol: String, nShards: Int): DataFrame =
    assign(df, idCol, nShards)
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col(textCol))).cast("long")).as("n_tokens"),
        sum(octet_length(col(textCol)).cast("long")).as("n_bytes")
      )
}
