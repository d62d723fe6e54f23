package graft

import java.io.File
import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.lit

/** Runs the reference implementation's own golden test corpus
  * (/root/reference/testdata/Goldens: input.pql + expected output.csv
  * over the CSV/JSON fixture tables) through graft on Spark.
  *
  * This is the "a user of the reference could switch engines" gate:
  * same queries, same tables, same rows out.
  */
class GoldenSpec extends SparkTestBase {

  private val goldensDir = new File("/root/reference/testdata/Goldens")
  private val tablesDir = new File("/root/reference/testdata/Tables")

  // ---- fixture tables ------------------------------------------------

  private lazy val tables: Map[String, DataFrame] = {
    val out = mutable.Map[String, DataFrame]()
    for (f <- tablesDir.listFiles().toList if f.getName.endsWith(".csv")) {
      val name = f.getName.stripSuffix(".csv")
      // ClickHouse CSV columns are never NULL: empty field = empty
      // string. Use an unmatchable nullValue so Spark agrees.
      out(name) = spark.read
        .option("header", "true")
        .option("inferSchema", "true")
        .option("nullValue", "")
        .csv(f.getPath)
    }
    for (f <- tablesDir.listFiles().toList if f.getName.endsWith(".json"))
      out(f.getName.stripSuffix(".json")) = loadClickHouseJson(f)
    out.toMap
  }

  /** Loads a ClickHouse-JSON-format fixture ({"meta": [...], "data":
    * [...]}) with Map-typed columns (only MapTable uses this shape).
    */
  private def loadClickHouseJson(f: File): DataFrame = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val j = JsonMethods.parse(Files.readString(f.toPath))
    val rows = (j \ "data").extract[List[JObject]].map { o =>
      ((o \ "id").extract[Int], (o \ "a").extract[Map[String, Long]])
    }
    val session = spark
    import session.implicits._
    rows.toDF("id", "a")
  }

  private def catalog(name: String): DataFrame =
    tables.getOrElse(name, sys.error(s"no fixture table $name"))

  // ---- expected-output handling --------------------------------------

  /** Minimal quote-aware CSV parser for the expected outputs. */
  private def parseCsv(text: String): List[List[String]] = {
    val rows = List.newBuilder[List[String]]
    val row = List.newBuilder[String]
    val field = new StringBuilder
    var inQuotes = false
    var sawAny = false
    var i = 0
    def endField(): Unit = { row += field.result(); field.clear() }
    def endRow(): Unit = { endField(); rows += row.result(); row.clear() }
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') { field += '"'; i += 1 }
          else inQuotes = false
        } else field += c
      } else
        c match {
          case '"'  => inQuotes = true; sawAny = true
          case ','  => endField(); sawAny = true
          case '\r' =>
          case '\n' => if (sawAny || field.nonEmpty) endRow(); sawAny = false
          case ch   => field += ch; sawAny = true
        }
      i += 1
    }
    if (sawAny || field.nonEmpty) endRow()
    rows.result()
  }

  /** Render a Spark value the way ClickHouse CSV does. */
  private def show(v: Any): String = v match {
    case null          => ""
    case true          => "1"
    case false         => "0"
    case d: Double     => if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else d.toString
    case f: Float      => show(f.toDouble)
    case b: BigDecimal => if (b.isWhole) b.toBigInt.toString else b.toString
    case other         => other.toString
  }

  private def loadParams(dir: File): Map[String, Column] = {
    val f = new File(dir, "options.jwcc")
    if (!f.exists()) return Map.empty
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    // The reference uses HuJSON (trailing commas allowed) — strip them.
    val text = Files.readString(f.toPath).replaceAll(",\\s*([}\\]])", "$1")
    val j = JsonMethods.parse(text)
    (j \ "parameters") match {
      case JObject(fields) =>
        fields.map { case (name, spec) =>
          val value = (spec \ "value").extract[String]
          val column =
            if (value.matches("-?[0-9]+")) lit(value.toLong)
            else if (value.matches("-?[0-9]*\\.[0-9]+")) lit(value.toDouble)
            else lit(value)
          name -> column
        }.toMap
      case _ => Map.empty
    }
  }

  // ---- the tests -----------------------------------------------------

  for (dir <- goldensDir.listFiles().toList.filter(_.isDirectory).sortBy(_.getName)) {
    val name = dir.getName
    test(s"golden: $name") {
      assume(!new File(dir, "skip").exists(), "'skip' marker present")
      val input = Files.readString(Paths.get(dir.getPath, "input.pql"))
      val params = loadParams(dir)
      val result = Pql.query(spark, input, catalog, params)

      val expectedFile = new File(dir, "output.csv")
      if (!expectedFile.exists()) {
        // No expected rows recorded (e.g. nondeterministic now()):
        // assert the query executes.
        result.collect()
      } else {
        val expected = parseCsv(Files.readString(expectedFile.toPath))
        val expHeader = expected.head
        val expRows = expected.tail

        assert(result.columns.toList == expHeader, s"column mismatch in $name")

        val gotRows = result.collect().toList.map(_.toSeq.map(show).toList)
        val unordered = new File(dir, "unordered").exists()
        if (unordered)
          assert(
            gotRows.sortBy(_.mkString("")) == expRows.sortBy(_.mkString("")),
            s"row multiset mismatch in $name"
          )
        else assert(gotRows == expRows, s"row mismatch in $name")
      }
    }
  }
}
