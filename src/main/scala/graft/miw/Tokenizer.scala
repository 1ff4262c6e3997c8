package graft.miw

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Line tokenization matching the reference engine's semantics
  * (reference: miw/log_format.cc:100-173).
  *
  * Two paths:
  *  - no quotechar: split on any char of the delimiter *set*, dropping
  *    empty tokens (runs of delimiters collapse). This is expressed as
  *    pure Column expressions so it stays inside whole-stage codegen.
  *  - quotechar set: a scanner that additionally keeps quoted spans
  *    (token starting with the quote char runs until a token ending
  *    with the quote char, delimiters in between preserved) — a Scala
  *    UDF, since `split` cannot express the rejoin.
  */
object Tokenizer {

  /** Split on runs of any delimiter char, no empty tokens.
    * Mirrors boost::char_separator / tokenize_simple semantics. */
  def simpleSplit(line: String, delims: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = line.length
    while (i < n) {
      if (delims.indexOf(line.charAt(i)) >= 0) i += 1
      else {
        val start = i
        while (i < n && delims.indexOf(line.charAt(i)) < 0) i += 1
        out += line.substring(start, i)
      }
    }
    out.result()
  }

  /** Quote-aware split: a token that begins with `quote` extends (with
    * interior delimiters preserved) until a position holding `quote`
    * that terminates a raw token (i.e. is followed by a delimiter or
    * end-of-line). Unclosed quote ⇒ rest of line becomes the token.
    * (reference: miw/log_format.cc:121-173) */
  def quotedSplit(line: String, delims: String, quote: Char): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = line.length
    while (i < n) {
      if (delims.indexOf(line.charAt(i)) >= 0) i += 1
      else if (line.charAt(i) == quote) {
        var j = i + 1
        var end = -1
        while (j < n && end < 0) {
          if (line.charAt(j) == quote &&
              (j == n - 1 || delims.indexOf(line.charAt(j + 1)) >= 0))
            end = j
          j += 1
        }
        if (end < 0) { out += line.substring(i); i = n }
        else { out += line.substring(i, end + 1); i = end + 1 }
      } else {
        val start = i
        while (i < n && delims.indexOf(line.charAt(i)) < 0) i += 1
        out += line.substring(start, i)
      }
    }
    out.result()
  }

  private def escapeForCharClass(delims: String): String =
    delims.flatMap {
      case c @ ('\\' | ']' | '[' | '^' | '-') => "\\" + c
      case c => c.toString
    }

  /** Column of array&lt;string&gt; tokens for `line`. Codegen-friendly
    * regex split when no quotechar; the native UTF8String scanner
    * expression (graft.functions.QuotedTokenize — same semantics as
    * [[quotedSplit]], no boxing) otherwise. */
  def tokensCol(line: Column, delims: String, quotechar: String): Column =
    if (quotechar.isEmpty) {
      val cls = "[" + escapeForCharClass(delims) + "]"
      filter(split(line, cls), t => t =!= lit(""))
    } else if (delims.forall(_ < 0x80) && quotechar.charAt(0) < 0x80) {
      // the native scanner compares raw UTF-8 bytes; a non-ASCII delim
      // or quotechar would truncate to a byte that can spuriously match
      // UTF-8 continuation bytes — those take the UDF fallback below
      graft.functions.TokenizeExpr.quotedTokenize(line, delims, quotechar.charAt(0))
    } else {
      val q = quotechar.charAt(0)
      val f = udf((s: String) =>
        if (s == null) Vector.empty[String] else quotedSplit(s, delims, q))
      f(line)
    }
}
