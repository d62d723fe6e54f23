package graft

/** Package-level parser utilities.
  *
  * [[splitStatements]] is the analogue of the reference's
  * `parser.SplitStatements` (reference parser/lex.go:338-351): split a
  * source string into statements at top-level semicolons, where
  * "top-level" is decided lexically — semicolons inside string
  * literals, quoted identifiers, and `//` comments do NOT split.
  */
package object parser {

  /** Split `source` by semicolons, lexically.
    *
    * Matches the reference's semantics exactly (lex.go:338-351 over the
    * error-TOLERANT `Scan`): the text BEFORE each semicolon becomes a
    * part (the semicolon itself is dropped), and the remainder after
    * the last semicolon is always appended — so the result is never
    * empty and `splitStatements("") == Vector("")`. Unlike
    * [[Lexer.scan]], malformed input (unterminated string, stray
    * character) never throws here: an unterminated string consumes to
    * end-of-line/EOF the way the reference's error token does, and
    * scanning continues, so a semicolon on the NEXT line still splits.
    *
    * Only three constructs can hide a semicolon from the lexer —
    * strings, backtick-quoted identifiers, and line comments; every
    * other token never spans a `;`, so the scan below tracks exactly
    * those.
    */
  def splitStatements(source: String): Vector[String] = {
    val parts = Vector.newBuilder[String]
    var start = 0
    var i = 0
    val n = source.length
    while (i < n) {
      source.charAt(i) match {
        case ';' =>
          parts += source.substring(start, i)
          i += 1
          start = i
        case q @ ('"' | '\'') =>
          // string literal: ends at the matching quote; an unescaped
          // newline or EOF ends it early (reference: error token up to
          // that point, newline put back and rescanned as whitespace)
          i += 1
          var done = false
          while (!done && i < n) {
            source.charAt(i) match {
              case `q`  => i += 1; done = true
              case '\n' => done = true // newline not consumed
              case '\\' =>
                i += 1
                if (i < n && source.charAt(i) != '\n') i += 1
              case _ => i += 1
            }
          }
        case '`' =>
          // quoted identifier: `` is an escaped backtick; newline/EOF
          // ends it early (reference quotedIdent error behavior)
          i += 1
          var done = false
          while (!done && i < n) {
            source.charAt(i) match {
              case '`' =>
                if (i + 1 < n && source.charAt(i + 1) == '`') i += 2
                else { i += 1; done = true }
              case '\n' => done = true
              case _    => i += 1
            }
          }
        case '/' if i + 1 < n && source.charAt(i + 1) == '/' =>
          while (i < n && source.charAt(i) != '\n') i += 1
        case _ =>
          i += 1
      }
    }
    parts += source.substring(start)
    parts.result()
  }
}
