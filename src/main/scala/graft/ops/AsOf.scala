package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — an operator Spark has no builtin
  * for, composed from builtins in the shape that scales.
  *
  * A naive formulation is a range join (`l.ts >= r.ts` + windowed
  * max), which Spark plans as a broadcast-nested-loop or sort-merge
  * with per-row range probing — quadratic on hot keys. This
  * implementation uses the UNION + KEYED WINDOW form instead: tag both
  * sides, union them, and run `last(value, ignoreNulls)` over a
  * per-key event-time window. One shuffle on the join key, one sort,
  * linear work, no range condition anywhere — the same plan a
  * time-series engine's ASOF JOIN lowers to (DuckDB's native
  * `ASOF JOIN` is the correctness oracle).
  *
  * Tie semantics: a right row at exactly the left row's timestamp
  * matches (`>=`, like DuckDB/kdb) — right rows sort before left rows
  * at equal timestamps.
  */
object AsOf {

  /** Join each left row to the most recent right row with
    * `right.tsCol <= left.tsCol` on the same `keyCols`. Left rows with
    * no prior right row keep NULL value columns (left-outer
    * semantics). `right` must carry exactly `keyCols :+ tsCol :+
    * valueCols` and be unique per (key, ts) — pre-aggregate if not.
    *
    * Output: every `left` column, plus `valueCols` from the matched
    * right row.
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCols: Seq[String]
  ): DataFrame = {
    require(keyCols.nonEmpty, "as-of join requires at least one key column")
    val leftCols = left.columns.toSeq
    require(
      valueCols.intersect(leftCols).isEmpty,
      s"value columns ${valueCols.intersect(leftCols).mkString(",")} collide with left columns"
    )

    // All value columns ride in ONE struct so the window fill picks an
    // entire right row atomically. Filling each column independently
    // with last(ignoreNulls) would skip a matched row's NULL value in
    // favor of an older row's — and could mix values from DIFFERENT
    // right rows. A struct over right rows is never NULL (even if every
    // field is), so ignoreNulls skips only the left placeholders.
    //
    // a NULL-timestamp right row can match nothing (NULL compares false
    // in any ASOF engine) — and must not sort nulls-first into the
    // window where it would become everyone's "prior" row
    val rWithVals = right
      .filter(col(tsCol).isNotNull)
      .withColumn("__vals", struct(valueCols.map(col): _*))
    val valsType = rWithVals.schema("__vals").dataType

    // Right rows sort BEFORE left rows at the same timestamp so an
    // exact-timestamp right row is visible to that left row (>=).
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__vals", lit(null).cast(valsType))
    val r = leftCols.filterNot(keyCols.contains).filterNot(_ == tsCol)
      .foldLeft(rWithVals.withColumn("__side", lit(0)))((df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      )

    val shared = leftCols :+ "__vals" :+ "__side"
    val unioned = l.select(shared.map(col): _*)
      .unionByName(r.select(shared.map(col): _*))

    val win = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = unioned
      .withColumn("__vals", last(col("__vals"), ignoreNulls = true).over(win))
      .filter(col("__side") === 1)
    valueCols.foldLeft(filled)((df, c) =>
      df.withColumn(c, col("__vals").getField(c))
    ).drop("__vals", "__side")
  }

  /** [[joinAsOf]] with a staleness bound: matches older than
    * `tolerance` (an interval string, e.g. "1 hour") before the left
    * timestamp are nulled out — the "quote too old, treat as missing"
    * rule of market-data as-of joins.
    */
  def joinAsOfTolerant(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCols: Seq[String],
      tolerance: String
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightTs = "__right_ts"
    val r = right.withColumn(rightTs, col(tsCol))
    val joined = joinAsOf(left, r, keyCols, tsCol, valueCols :+ rightTs)
    val fresh = col(rightTs) >= col(tsCol) - expr(s"INTERVAL $tolerance")
    valueCols.foldLeft(joined)((df, c) =>
      df.withColumn(c, when(fresh, col(c)))
    ).drop(rightTs)
  }
}
