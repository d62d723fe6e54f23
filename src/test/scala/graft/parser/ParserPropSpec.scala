package graft.parser

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.Pql

/** Property tests for the lexer/parser: total robustness (never crash
  * with anything but PqlParseException) and identifier/literal
  * round-trips. Deterministic seeds — failures reproduce.
  */
class ParserPropSpec extends AnyFunSuite {

  /** Run `f` over `n` deterministic samples of `gen`. */
  private def check[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(42L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 3) {
      gen(params, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(produced > 0, "generator produced no samples")
  }

  private def parses(src: String): Boolean =
    try { Pql.parse(src); true }
    catch { case _: PqlParseException => false }

  test("arbitrary ascii strings parse or raise PqlParseException, never crash") {
    check(Gen.listOf(Gen.asciiPrintableChar).map(_.mkString), 500)(parses)
  }

  test("arbitrary operator soup never crashes") {
    val frag = Gen.oneOf(
      "|", "where", "project", "summarize", "join", "==", "!=", "=~", "(", ")",
      "[", "]", ",", ";", "let", "x", "T", "1", "0x1f", "1.5e3", "\"s\"", "'s'",
      "`q`", "+", "-", "*", "/", "%", "and", "or", "in", "by", "$left", "."
    )
    check(Gen.listOf(frag).map(_.mkString(" ")), 500)(parses)
  }

  private val identGen: Gen[String] = for {
    head <- Gen.oneOf(Gen.alphaChar, Gen.const('_'))
    tail <- Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('_')))
  } yield (head :: tail).mkString

  test("plain identifiers are valid project targets") {
    check(identGen, 200) { id =>
      assert(parses(s"T | project $id"), s"identifier <$id> failed to parse")
    }
  }

  test("quoted identifiers accept arbitrary printable content") {
    val content = Gen.nonEmptyListOf(
      Gen.asciiPrintableChar.suchThat(c => c != '`' && c != '\\')
    ).map(_.mkString)
    check(content, 200) { s =>
      assert(Pql.parse(s"T | project `$s`").nonEmpty, s"quoted <$s> failed")
    }
  }

  test("integer and float literals always parse in a where clause") {
    check(Gen.chooseNum(0L, Long.MaxValue / 2), 200) { n =>
      assert(parses(s"T | where x == $n"))
      assert(parses(s"T | where x == -$n"))
    }
    check(Gen.chooseNum(0.0, 1e12), 200) { d =>
      assert(parses(s"T | where x == $d"))
    }
  }
}
