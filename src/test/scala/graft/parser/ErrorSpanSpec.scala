package graft.parser

import org.scalatest.funsuite.AnyFunSuite

/** Error-POSITION parity on the reference's known-bad inputs.
  *
  * The reference's parse errors carry source spans
  * (/root/reference/parser/parser.go via span.go; the malformed
  * queries below are its parser_test.go `err: true` cases). FuzzSpec
  * already proves graft never crashes on bad input; this spec pins the
  * diagnostics themselves: each error's span must anchor EXACTLY on
  * the offending token (start offset and width), not merely "somewhere
  * in the query" — a span one token off sends a user editing the wrong
  * place.
  */
class ErrorSpanSpec extends AnyFunSuite {

  private def errSpan(src: String): Span =
    intercept[PqlParseException](Parser.parse(src)).span

  /** Assert the error span covers exactly `token` (its `occurrence`-th
    * appearance, 0-based) in `src`.
    */
  private def assertAnchored(src: String, token: String, occurrence: Int = 0): Unit = {
    var idx = -1
    var left = occurrence
    do { idx = src.indexOf(token, idx + 1); left -= 1 } while (left >= 0 && idx >= 0)
    assert(idx >= 0, s"test bug: '$token' not in <$src>")
    val span = errSpan(src)
    assert(
      span == Span(idx, idx + token.length),
      s"<$src>: expected span [${idx}, ${idx + token.length}) over '$token', got [${span.start}, ${span.end})"
    )
  }

  test("lexer: unrecognized bare '!' anchors on the character") {
    assertAnchored("!", "!")
    assertAnchored("T | where a ! b", "!")
  }

  test("empty function-argument slot anchors on the comma") {
    // reference parser_test.go: `StormEvents | where rand(,)`
    assertAnchored("StormEvents | where rand(,)", ",")
  }

  test("trailing garbage after a clause anchors on the first extra token") {
    // reference: `StormEvents | count x | where true`
    assertAnchored("StormEvents | count x | where true", "x")
    // reference: `StormEvents | project EventId=1 State`
    assertAnchored("StormEvents | project EventId=1 State", "State")
    // reference: `StormEvents | extend FooFooF=1 State`
    assertAnchored("StormEvents | extend FooFooF=1 State", "State")
  }

  test("unclosed index expression anchors on the token where ']' was expected") {
    // reference: `tab | where mapcol['strkey' x] == 42`
    assertAnchored("tab | where mapcol['strkey' x] == 42", "x")
  }

  test("dangling dot in an expression anchors on the dot") {
    // reference: `foo | where strcat('a', .bork, 'x', 'y')`
    assertAnchored("foo | where strcat('a', .bork, 'x', 'y')", ".")
    // reference: `foo | where (.bork) + 2`
    assertAnchored("foo | where (.bork) + 2", ".")
  }

  test("summarize with nothing to compute anchors at EOF") {
    // reference: `StormEvents | summarize` / `| summarize by`
    assert(errSpan("StormEvents | summarize") == Span.at("StormEvents | summarize".length))
    assert(errSpan("StormEvents | summarize by") == Span.at("StormEvents | summarize by".length))
  }

  test("bad join flavor anchors on the flavor word") {
    // reference: `X | join kind=salt (Y) on Key`
    assertAnchored("X | join kind=salt (Y) on Key", "salt")
  }

  test("graft extension operators anchor their own diagnostics") {
    assertAnchored("D | dedup kind=bogus text by doc_id", "bogus")
    assertAnchored("E | dedup kind=embed dim=x embedding by vec_id", "x")
    assertAnchored("T | top 3 State", "State")
    assertAnchored("T | take 1.5", "1.5")
  }

  test("error messages carry 1-based line:column derived from the span") {
    val e = intercept[PqlParseException](Parser.parse("T\n| count x"))
    // 'x' is line 2, column 9 (1-based)
    assert(e.getMessage.startsWith("2:9:"), e.getMessage)
  }

  // ---- the REMAINING reference error corpus (round 12): every
  // `err: true` case in parser_test.go and every TokenError case in
  // lex_test.go now has a position-exact assertion. The reference's
  // tolerant scanner emits error TOKENS and keeps going; graft's strict
  // lexer throws at the first of them — parity is thrown-span ==
  // FIRST reference error-token span.

  test("parser_test.go: double trailing comma anchors on the empty slot's comma") {
    // reference TwoArgFunctionWithTwoTrailingCommas
    assertAnchored("""StormEvents | where strcat("abc", "def",,)""", ",", occurrence = 2)
  }

  test("parser_test.go: summarize followed by a random keyword anchors on it") {
    // reference SummarizeRandomToken
    assertAnchored("StormEvents | summarize and", "and")
  }

  test("lex_test.go: unterminated quoted identifier spans to EOF") {
    // reference UnterminatedQuotedIdent: Error(0,4)
    assert(errSpan("`foo") == Span(0, 4))
    // reference LineSplitQuotedIdent: first Error(0,4) — stops BEFORE the newline
    assert(errSpan("`foo\nbar`") == Span(0, 4))
  }

  test("lex_test.go: unterminated / line-split strings span the consumed prefix") {
    // reference UnterminatedString: Error(0,4)
    assert(errSpan("\"abc") == Span(0, 4))
    // reference StringWithNewline: first Error(0,4)
    assert(errSpan("\"abc\ndef\"") == Span(0, 4))
    // reference LineSplitMapKey: first Error(1,5) — the string, not the bracket
    assert(errSpan("['foo\nbar']") == Span(1, 5))
    // reference StringWithEOFAfterBackslash: Error(0,5) — backslash consumed
    assert(errSpan("\"abc\\") == Span(0, 5))
    // reference StringWithNewlineAfterBackslash: first Error(0,5)
    assert(errSpan("\"abc\\\ndef\"") == Span(0, 5))
  }

  test("lex_test.go: hex-literal errors span '0x' only, not trailing content") {
    // reference UnterminatedHex: Error(0,2)
    assert(errSpan("0x") == Span(0, 2))
    // reference BrokenHex: Error(0,2), the 'y' is a SEPARATE identifier token
    assert(errSpan("0xy") == Span(0, 2))
  }

  test("lex_test.go: unrecognized characters span exactly one char (fuzz corpus shape)") {
    // reference Fuzz8adaab75de5f9003: first Error(8,9) on the NUL byte
    assert(errSpan("vents | \u0000\u0010\u0000\u0000M=") == Span(8, 9))
  }
}
