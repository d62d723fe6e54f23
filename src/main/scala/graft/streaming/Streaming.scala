package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.Pql

/** Structured-Streaming entry points.
  *
  * graft's compiler emits one declarative Catalyst plan per query, so
  * the SAME compiled plan runs over batch or streaming inputs — the
  * catalog just hands back a `readStream` DataFrame instead of a batch
  * one (reference compiles to SQL strings and has no streaming story;
  * this is the Spark-native upgrade).
  *
  * Scale posture: stateful aggregations must bound their state.
  * [[withEventTime]] attaches the watermark that lets Spark evict
  * closed windows; [[binWindow]] maps PQL's `bin(ts, d)` bucketing to
  * a native `window()` so append-mode sinks (kafka/parquet) work with
  * finalized-only results.
  */
object Streaming {

  /** Compile a PQL query whose table names resolve through `catalog`
    * to streaming DataFrames — identical semantics to the batch path
    * (it IS the batch compile; the plan is input-agnostic).
    */
  def query(
      spark: SparkSession,
      source: String,
      catalog: String => DataFrame,
      params: Map[String, Column] = Map.empty
  ): DataFrame = Pql.query(spark, source, catalog, params)

  /** Declare `tsCol` as event time with a lateness bound. Required for
    * append-mode windowed aggregation (bounded state at scale).
    */
  def withEventTime(df: DataFrame, tsCol: String, maxLateness: String): DataFrame =
    df.withWatermark(tsCol, maxLateness)

  /** Tumbling event-time window, the streaming equivalent of PQL
    * `bin(ts, duration)`: group by THIS struct (project `.start` after
    * the aggregation — extracting it before hides the event-time
    * window from the analyzer and breaks append mode), so state is
    * evictable once the watermark passes the window end.
    */
  def binWindow(tsCol: Column, duration: String): Column =
    window(tsCol, duration)

  /** Run a compiled (streaming) plan into an in-memory table named
    * `name` — the test/debug sink. `complete` mode mirrors batch
    * results for unbounded aggregations; `append` emits only
    * watermark-finalized rows.
    */
  def runToMemory(df: DataFrame, name: String, outputMode: String): StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode(outputMode).start()
}
