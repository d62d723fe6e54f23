package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixes.
  *
  * A training pipeline rebalances sources ("keep 20% of web, all of
  * books") with REPRODUCIBLE membership: the same row must make the
  * same keep/drop decision on every run, on any engine, at any
  * parallelism. `df.sample()` cannot promise that (seed × partitioning
  * dependent), so these ops hash a stable row id instead — a narrow
  * codegen projection + filter, no shuffle, trivially pushdown-friendly
  * at 100 TB.
  */
object Sampling {

  /** Uniform [0, 1) hash of a stable id (md5-derived — every engine
    * reproduces it: DuckDB `('0x' || substr(md5(x), 1, 8))::BIGINT`).
    */
  private def hashUnit(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt)).cast("binary")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0) // 2^32

  /** Deterministic Bernoulli sample: keeps each row iff
    * `hash(id, salt) < rate`. Same rows survive on every engine/run.
    */
  def bernoulli(df: DataFrame, idCol: String, rate: Double, salt: String = "graft"): DataFrame =
    df.filter(hashUnit(col(idCol), salt) < rate)

  /** Stratified deterministic sample: per-stratum keep rates (e.g.
    * `lang -> rate` quotas for a training mix); strata not listed keep
    * `defaultRate`. One codegen'd CASE over the stratum column — no
    * shuffle, no per-stratum scans.
    */
  def stratified(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0,
      salt: String = "graft"
  ): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (stratum, r)) =>
      when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(hashUnit(col(idCol), salt) < rate)
  }
}
