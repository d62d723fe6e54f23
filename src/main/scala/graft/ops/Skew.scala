package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join handling splits oversized shuffle partitions at
  * runtime, but only for sort-merge joins and only after a shuffle has
  * materialized. For KNOWN-skewed dimensions (a handful of keys
  * carrying most rows — the usual shape of event/tenant tables at
  * 100 TB) explicit salting keeps every shuffle partition bounded by
  * construction: the large side spreads each hot key across `nSalts`
  * partitions, the small side is replicated `nSalts` ways, and the
  * join key becomes (key, salt).
  */
object Skew {

  /** Equi-join `large ⋈ small` on `largeKey == smallKey` with the
    * large side salted into `nSalts` buckets. Row-deterministic: the
    * salt is a hash of the large row's full content, not a random
    * draw, so results and partitioning are reproducible run-to-run.
    * Cost: `small` is replicated `nSalts`× (keep it broadcast-sized).
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      largeKey: String,
      smallKey: String,
      nSalts: Int,
      joinType: String = "inner"
  ): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    // right/full outer would emit an unmatched small-side row once PER
    // SALT REPLICA — reject join types whose semantics salting breaks
    val supported = Set("inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti")
    require(
      supported.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins only, got $joinType"
    )
    val salted = large.withColumn(
      "__salt",
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(nSalts)).cast("int")
    )
    val replicated = small.select(
      col("*"),
      explode(sequence(lit(0), lit(nSalts - 1))).as("__salt")
    )
    salted
      .join(
        replicated,
        salted(largeKey) === replicated(smallKey) && salted("__salt") === replicated("__salt"),
        joinType
      )
      .drop("__salt")
  }
}
