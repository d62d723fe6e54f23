package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.parser.PqlParseException

/** Replays the reference's Go fuzz corpus
  * (reference: parser/testdata/fuzz/FuzzParse, FuzzScan) through
  * graft's parser: every input must either parse or raise
  * PqlParseException — never crash with anything else.
  */
class FuzzSpec extends AnyFunSuite {

  private val fuzzRoot = Paths.get("/root/reference/parser/testdata/fuzz")

  /** Decode the Go fuzz-corpus literal `string("...")` (Go escape
    * syntax: \xNN, \uNNNN, \n, \t, ...).
    */
  private def goUnquote(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'x' => sb.append(Integer.parseInt(s.substring(i + 2, i + 4), 16).toChar); i += 4
          case 'u' => sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'a' => sb.append('\u0007'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'v' => sb.append('\u000b'); i += 2
          case '0' => sb.append('\u0000'); i += 2
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def corpusInputs: Seq[(String, String)] =
    if (!Files.isDirectory(fuzzRoot)) Seq.empty
    else
      Files.walk(fuzzRoot).iterator().asScala
        .filter(Files.isRegularFile(_))
        .map { p: Path =>
          val lines = new String(Files.readAllBytes(p), "UTF-8").linesIterator.toList
          val lit = lines.collectFirst {
            case l if l.startsWith("string(\"") && l.endsWith("\")") =>
              goUnquote(l.stripPrefix("string(\"").stripSuffix("\")"))
          }
          p.getFileName.toString -> lit
        }
        .collect { case (n, Some(src)) => n -> src }
        .toSeq

  test("reference fuzz corpus: parse or PqlParseException, never crash") {
    val inputs = corpusInputs
    assert(inputs.nonEmpty, s"no fuzz inputs found under $fuzzRoot")
    for ((name, src) <- inputs) {
      try Pql.parse(src)
      catch {
        case _: PqlParseException => // expected for malformed input
        case e: Throwable => fail(s"fuzz input $name crashed with ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("reference fuzz corpus through compileToSql: SQL text or typed error, never crash") {
    // the SQL backend must be exactly as robust as the parser: every
    // corpus input either compiles to a string or raises a typed
    // parse/compile error (unknown tables resolve to a dummy schema so
    // compilation proceeds past the catalog)
    val spark = SparkTestBase.spark
    import spark.implicits._
    val dummy = Seq((1L, "x")).toDF("a", "b")
    for ((name, src) <- corpusInputs) {
      try Pql.compileToSql(src, _ => dummy)
      catch {
        case _: PqlParseException                   => ()
        case _: graft.compiler.PqlCompileException  => ()
        case e: Throwable =>
          fail(s"fuzz input $name crashed compileToSql with ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("random byte soup never crashes the parser") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val len = rnd.nextInt(40)
      val src = new String(Array.fill(len)(rnd.nextPrintableChar()))
      try Pql.parse(src)
      catch { case _: PqlParseException => () }
    }
  }

  test("raw control/high bytes never crash the parser (reference corpus shape)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val len = rnd.nextInt(32)
      // full char range incl. NUL, control chars, surrogo-ish values
      val src = new String(Array.fill(len)(rnd.nextInt(0xffff).toChar))
      try Pql.parse(src)
      catch { case _: PqlParseException => () }
    }
    // targeted: embedded NULs around valid syntax
    for (s <- Seq("T | where x == 1\u0000", "\u0000T", "T | project `a\u0000b`")) {
      try Pql.parse(s)
      catch { case _: PqlParseException => () }
    }
  }
}
