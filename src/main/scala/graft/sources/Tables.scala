package graft.sources

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table catalog (`<dir>/<name>.parquet` → DataFrame).
  *
  * Unlike a bare `spark.read.parquet`, this catalog transparently
  * handles parquet `TIMESTAMP(NANOS)` columns (written by e.g. pyarrow
  * with ns-precision pandas timestamps), which Spark otherwise refuses
  * to read (`PARQUET_TYPE_ILLEGAL`). Nano columns are read as epoch
  * nanos (via `spark.sql.legacy.parquet.nanosAsLong`) and converted to
  * micro-precision timestamps with exact integer arithmetic
  * (`timestamp_micros(x div 1000)`) — the same floor-truncation other
  * engines (DuckDB, ClickHouse) apply when narrowing ns to µs.
  *
  * The footer inspection reads ONE file's metadata on the driver; the
  * data path stays a plain distributed parquet scan with pushdown and
  * pruning intact (the conversion is a per-row projection on top).
  */
object Tables {

  /** Process-wide table cache: resolving the same (session, resolved
    * path) reuses one DataFrame, so repeated queries share the file
    * index, footer metadata, and analyzed plan instead of re-listing
    * per catalog instance. The cache never evicts — the snapshot
    * semantics batch jobs want. Long-lived services that rewrite
    * table directories in place should call [[clearCache]] (or read
    * through their own catalog) to observe new files.
    */
  private val tableCache = TrieMap.empty[(SparkSession, String), DataFrame]

  /** Drop all cached table plans (e.g. after overwriting a table). */
  def clearCache(): Unit = tableCache.clear()

  /** Cache lookup that first evicts entries belonging to stopped
    * sessions: a stopped session's plans are unusable, and keeping them
    * would both pin the session for the JVM lifetime and hand a dead
    * plan to a new query that reuses the catalog path.
    */
  private def cached(spark: SparkSession, key: String)(mk: => DataFrame): DataFrame = {
    tableCache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    tableCache.getOrElseUpdate((spark, key), mk)
  }

  /** Catalog function over a directory of parquet tables. */
  def parquetDir(spark: SparkSession, dir: String): String => DataFrame =
    name => cached(spark, s"$dir/$name.parquet")(load(spark, s"$dir/$name.parquet"))

  /** Format-aware catalog over a directory: resolves
    * `<dir>/<name>.parquet`, `.orc` (schema-carrying, like parquet),
    * `.csv` (header, explicit-schema-free CSV gets inference — pin
    * schemas with `csvSchemas` to avoid drift), or `.json`
    * (line-delimited), whichever exists.
    */
  def dir(
      spark: SparkSession,
      dir: String,
      csvSchemas: Map[String, String] = Map.empty
  ): String => DataFrame = { name =>
    val base = s"$dir/$name"
    // parquet cache key matches parquetDir's so the same table resolved
    // through either catalog shares one entry
    if (exists(spark, s"$base.parquet"))
      cached(spark, s"$base.parquet")(load(spark, s"$base.parquet"))
    else cached(spark, base)(
      if (exists(spark, s"$base.orc")) spark.read.orc(s"$base.orc")
      else if (exists(spark, s"$base.csv")) {
        val r = spark.read.option("header", "true")
        csvSchemas.get(name) match {
          case Some(schema) => r.schema(schema).csv(s"$base.csv")
          case None => r.option("inferSchema", "true").csv(s"$base.csv")
        }
      } else if (exists(spark, s"$base.json")) spark.read.json(s"$base.json")
      else throw new IllegalArgumentException(
        s"no table $name under $dir (tried .parquet/.orc/.csv/.json)"
      )
    )
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Load one parquet file/directory, converting any TIMESTAMP(NANOS)
    * columns to micro-precision timestamps.
    *
    * NOTE: when nano columns are present this flips the SESSION-WIDE
    * conf `spark.sql.legacy.parquet.nanosAsLong` (there is no per-read
    * option for it) — other plain `spark.read.parquet` reads of
    * nano-timestamp files in the same session will then see BIGINT
    * epoch-nanos instead of an error. Reads through this catalog are
    * unaffected (the footer check applies the µs conversion whenever
    * the file has nano columns).
    */
  def load(spark: SparkSession, path: String): DataFrame = {
    val nanoCols = nanoTimestampColumns(spark, path)
    if (nanoCols.isEmpty) spark.read.parquet(path)
    else {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      nanoCols.foldLeft(spark.read.parquet(path)) { (df, c) =>
        val q = "`" + c.replace("`", "``") + "`"
        df.withColumn(c, timestamp_micros(expr(s"$q div 1000")))
      }
    }
  }

  /** Names of top-level TIMESTAMP(NANOS) primitive columns, from the
    * footer of one representative file (driver-side, metadata only).
    */
  private def nanoTimestampColumns(spark: SparkSession, path: String): Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Nil
    val fileOpt =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath).find(_.getName.endsWith(".parquet"))
      else Some(p)
    fileOpt match {
      case None => Nil
      case Some(file) =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
        try {
          reader.getFooter.getFileMetaData.getSchema.getFields.asScala.collect {
            case f
                if f.isPrimitive && (f.getLogicalTypeAnnotation match {
                  case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                    t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
                  case _ => false
                }) =>
              f.getName
          }.toSeq
        } finally reader.close()
    }
  }
}
