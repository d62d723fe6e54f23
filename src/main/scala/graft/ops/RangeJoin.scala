package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join (point-in-interval) — Spark plans a raw
  * `l.ts BETWEEN r.start AND r.end` join as broadcast-nested-loop (or
  * sort-merge with per-row range probing): quadratic on hot keys and a
  * driver-killer at scale.
  *
  * This operator uses the BUCKETED EQUI-JOIN form (the same technique
  * a range-join hint lowers to in engines that have one): pick a
  * bucket width, explode each interval to every bucket it overlaps,
  * bucket each point into exactly one, equi-join on (key, bucket), and
  * exact-filter. Cost is linear in points + intervals × (avg interval
  * length / bucket width), all shuffles are hash joins on compact
  * keys, and a point meets a given interval in exactly one bucket so
  * no dedup pass is needed.
  */
object RangeJoin {

  /** Join each left row (point `tsCol`) to every right row whose
    * half-open interval `[startCol, endCol)` contains it, matching on
    * `keyCols`. Inner semantics: unmatched points drop out.
    *
    * `bucketMicros` tunes the explode factor: ~the typical interval
    * length is right (one-to-few buckets per interval).
    *
    * Output: every left column, plus right's columns except
    * `startCol`/`endCol` key duplicates (right must share `keyCols`
    * names; its other column names must not collide with left's).
    */
  def pointInInterval(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      startCol: String,
      endCol: String,
      bucketMicros: Long
  ): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    val lb = left.withColumn("__bucket", floorDiv(unix_micros(col(tsCol)), bucketMicros))
    val rb = right
      // degenerate intervals (end <= start) match nothing, and MUST be
      // dropped before the explode: Spark's sequence(a, b) generates a
      // DESCENDING range when b < a, which would fabricate buckets
      .filter(col(endCol) > col(startCol))
      .withColumn(
        "__bucket",
        explode(
          sequence(
            floorDiv(unix_micros(col(startCol)), bucketMicros),
            // end is EXCLUSIVE: an interval ending exactly on a bucket
            // boundary does not reach into that bucket
            floorDiv(unix_micros(col(endCol)) - 1, bucketMicros)
          )
        )
      )
    lb.join(rb, keyCols :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }

  /** Integer floor division, exact for negative epochs too (`div`
    * truncates toward zero; pre-1970 timestamps would land one bucket
    * high). `us - pmod(us, w)` is an exact multiple of `w` and epoch
    * micros stay far below 2^53, so the double division is exact.
    */
  private def floorDiv(us: org.apache.spark.sql.Column, w: Long) =
    ((us - pmod(us, lit(w))) / lit(w)).cast("long")
}
