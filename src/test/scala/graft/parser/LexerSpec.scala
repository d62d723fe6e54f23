package graft.parser

import org.scalatest.funsuite.AnyFunSuite
import TokenKind._

class LexerSpec extends AnyFunSuite {

  private def kinds(src: String): List[TokenKind] = Lexer.scan(src).map(_.kind).toList
  private def values(src: String): List[String] = Lexer.scan(src).map(_.value).toList

  test("pipeline tokens") {
    assert(
      kinds("T | where x > 5") == List(Identifier, Pipe, Identifier, Identifier, GT, Number)
    )
  }

  test("keywords") {
    assert(kinds("and or in by") == List(And, Or, In, By))
    assert(kinds("andy ByName") == List(Identifier, Identifier))
  }

  test("operators") {
    assert(
      kinds("= == != < <= > >= =~ !~ + - * / % . , ; ( ) [ ]") ==
        List(Assign, Eq, NE, LT, LE, GT, GE, CiEq, CiNE, Plus, Minus, Star, Slash, Mod,
          Dot, Comma, Semi, LParen, RParen, LBracket, RBracket)
    )
  }

  test("numbers normalize") {
    assert(values("123 3.14 1e-9 0xdeadbeef 007 0.5 .5 0") ==
      List("123", "3.14", "1e-9", "3735928559", "7", "0.5", "0.5", "0"))
    assert(kinds("1.") == List(Number, Dot) || kinds("1.") == List(Number))
  }

  test("lone dot is Dot token") {
    assert(kinds(". .x") == List(Dot, Dot, Identifier))
  }

  test("hex requires digits") {
    assertThrows[PqlParseException](Lexer.scan("0x"))
  }

  test("strings with escapes") {
    assert(values("""'abc' "d\ne"""") == List("abc", "d\ne"))
    assert(values("\"a\\tb\"") == List("a\tb"))
    assert(values("'don\\'t'") == List("don't"))
  }

  test("unterminated string fails") {
    assertThrows[PqlParseException](Lexer.scan("'abc"))
    assertThrows[PqlParseException](Lexer.scan("'ab\nc'"))
  }

  test("quoted identifiers") {
    val toks = Lexer.scan("`Storm Events` `tick``mark`")
    assert(toks.map(_.kind) == Vector(QuotedIdentifier, QuotedIdentifier))
    assert(toks.map(_.value) == Vector("Storm Events", "tick`mark"))
  }

  test("comments are skipped") {
    assert(kinds("a // rest of line\n| b") == List(Identifier, Pipe, Identifier))
  }

  test("identifiers may start with _ or $") {
    assert(values("_x $left a1_b") == List("_x", "$left", "a1_b"))
  }

  test("spans cover source text") {
    val toks = Lexer.scan("ab + cd")
    assert(toks(0).span == Span(0, 2))
    assert(toks(1).span == Span(3, 4))
    assert(toks(2).span == Span(5, 7))
  }

  test("bang alone is an error") {
    assertThrows[PqlParseException](Lexer.scan("a ! b"))
  }
}
