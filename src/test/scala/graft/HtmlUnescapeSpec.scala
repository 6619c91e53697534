package graft

import org.apache.spark.sql.functions._
import graft.functions.HtmlUnescape

class HtmlUnescapeSpec extends SparkSpec {
  import spark.implicits._

  /** Run through a real column (not a foldable literal) so whole-stage
    * codegen executes the generated path, not interpreted eval. */
  private def decode(s: String): String =
    Seq(s).toDF("v").select(HtmlUnescape($"v")).collect()(0).getString(0)

  test("named entities") {
    assert(decode("a &amp; b") == "a & b")
    assert(decode("&lt;x&gt;") == "<x>")
    assert(decode("&quot;q&quot; &apos;a&apos;") == "\"q\" 'a'")
    assert(decode("a&nbsp;b") == "a\u00a0b") // html.unescape parity: U+00A0
  }

  test("numeric and hex entities") {
    assert(decode("&#39;") == "'")
    assert(decode("&#x27;") == "'")
    assert(decode("&#X27;") == "'")
    assert(decode("&#128169;") == new String(Character.toChars(128169)))
  }

  test("malformed entities pass through literally") {
    assert(decode("a & b") == "a & b")                 // bare ampersand
    assert(decode("&unknown;") == "&unknown;")         // unknown name
    assert(decode("&#xZZ;") == "&#xZZ;")               // bad hex
    assert(decode("&waytoolongentity;") == "&waytoolongentity;")
  }

  test("semicolon-less legacy entities decode (html.unescape parity)") {
    assert(decode("&amp") == "&")       // HTML5 legacy form
    assert(decode("&ampx;") == "&x;")   // longest legacy prefix, rest literal
    assert(decode("fish &gt chips") == "fish > chips")
    assert(decode("&apos") == "&apos")  // apos is semicolon-only in HTML5
  }

  test("C1 numeric refs map through the windows-1252 table") {
    assert(decode("&#147;quoted&#148;") == "“quoted”")
    assert(decode("&#133;") == "…") // ellipsis
    assert(decode("&#129;") == "") // unmapped C1 → raw control kept
    assert(decode("&#0;") == "�")   // NUL → replacement char
    assert(decode("&#55296;") == "�") // surrogate → replacement char
    assert(decode("&#2;") == "")         // disallowed C0 control → dropped
  }

  test("invalid-codepoint set matches CPython html._invalid_codepoints") {
    assert(decode("&#11;") == "")     // VT IS in the invalid set → dropped
    assert(decode("&#12;") == "") // FF is NOT invalid → kept
  }

  test("semicolon-less NUMERIC refs decode (html.unescape parity)") {
    assert(decode("&#38") == "&")
    assert(decode("&#x26 x") == "& x")   // digits consumed, no semicolon
    assert(decode("&#38abc") == "&abc")  // run ends at first non-digit
    assert(decode("&#") == "&#")         // no digits: literal
    assert(decode("&#x") == "&#x")
    assert(decode("&#xG;") == "&#xG;")
    // overlong runs clamp past U+10FFFF -> U+FFFD, like CPython's bigint
    assert(decode("&#99999999999999999999;") == "�")
    assert(decode("&#x110000;") == "�")
    // non-ASCII Unicode digits do NOT match CPython's [0-9] charref regex
    assert(decode("&#٣٨;") == "&#٣٨;") // Arabic-Indic 38
    assert(decode("&#１;") == "&#１;")             // fullwidth 1
  }

  test("null propagates") {
    val r = Seq((null: String)).toDF("v").select(HtmlUnescape($"v")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("no-entity fast path returns input unchanged") {
    assert(decode("plain text with no entities") == "plain text with no entities")
  }
}
