package graft

import scala.io.Source

import org.apache.spark.sql.SparkSession

import graft.sources.Tables

/** Command-line entry point, the analog of the reference's `pql`
  * binary (reference: cmd/pql/main.go:1-216, which compiles a query
  * from stdin and prints SQL). graft compiles to a Spark plan, so the
  * CLI can additionally EXECUTE the query and print results or the
  * optimized physical plan.
  *
  * Usage:
  * {{{
  * graft.Cli [--tables DIR] [--explain | --compile] [--limit N] [QUERY]
  * }}}
  * With no QUERY argument the source is read from stdin (like the
  * reference). Tables resolve as `DIR/<name>.parquet`; without
  * `--tables`, names resolve from the Spark session catalog.
  * `--compile` prints the Spark SQL text ([[Pql.compileToSql]]) instead
  * of executing — the reference binary's own output mode.
  */
object Cli {

  private[graft] case class Opts(
      tablesDir: Option[String] = None,
      explain: Boolean = false,
      compileOnly: Boolean = false,
      limit: Int = 20,
      query: Option[String] = None
  )

  private def argError(msg: String): Nothing = {
    System.err.println(msg)
    sys.exit(2)
  }

  private[graft] def parseArgs(args: List[String], acc: Opts = Opts()): Opts = args match {
    case "--tables" :: dir :: rest => parseArgs(rest, acc.copy(tablesDir = Some(dir)))
    case "--tables" :: Nil => argError("--tables requires a directory")
    case "--explain" :: rest => parseArgs(rest, acc.copy(explain = true))
    case "--compile" :: rest => parseArgs(rest, acc.copy(compileOnly = true))
    case "--limit" :: n :: rest =>
      parseArgs(rest, acc.copy(limit = n.toIntOption.getOrElse(argError(s"--limit requires a number, got $n"))))
    case "--limit" :: Nil => argError("--limit requires a number")
    case q :: rest => parseArgs(rest, acc.copy(query = Some((acc.query.toSeq :+ q).mkString(" "))))
    case Nil => acc
  }

  /** Resolve the table catalog and compile `source` to a DataFrame —
    * the testable core of [[main]], which only adds I/O and exit codes.
    */
  private[graft] def compile(
      spark: SparkSession,
      opts: Opts,
      source: String
  ): org.apache.spark.sql.DataFrame = {
    val catalog: String => org.apache.spark.sql.DataFrame = opts.tablesDir match {
      case Some(dir) => Tables.parquetDir(spark, dir)
      case None => name => spark.table(name)
    }
    Pql.query(spark, source, catalog)
  }

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args.toList, Opts())
    val source = opts.query.getOrElse(Source.stdin.mkString)
    if (source.trim.isEmpty) {
      System.err.println(
        "usage: graft.Cli [--tables DIR] [--explain | --compile] [--limit N] [QUERY]  (or query on stdin)")
      sys.exit(2)
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      if (opts.compileOnly) {
        // --compile: print the Spark SQL text instead of executing —
        // the reference binary's behavior (it always prints SQL)
        val catalog: String => org.apache.spark.sql.DataFrame = opts.tablesDir match {
          case Some(dir) => Tables.parquetDir(spark, dir)
          case None      => name => spark.table(name)
        }
        println(Pql.compileToSql(source, catalog))
      } else {
        val df = compile(spark, opts, source)
        if (opts.explain) df.explain("formatted")
        else df.show(opts.limit, truncate = false)
      }
    } catch {
      // parse, compile, and analysis errors all get the clean one-line
      // treatment — a stack trace is a bug report, not a user message
      case e @ (_: graft.parser.PqlParseException | _: graft.compiler.PqlCompileException |
          _: org.apache.spark.sql.AnalysisException | _: IllegalArgumentException) =>
        System.err.println(e.getMessage)
        sys.exit(1)
    } finally spark.stop()
  }
}
