package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML entity unescape as a native Catalyst expression.
  *
  * The reference cleans toot HTML with Python's `html.unescape`
  * (reference: src/transformer/text_cleaner.py:16-43). Spark has no built-in
  * entity decoder, and a Scala UDF would break whole-stage codegen in the
  * bronze hot path — at 100 TB the clean/normalize stage dominates, so this
  * is implemented as a codegen'd `UnaryExpression` calling a static decoder.
  *
  * Supports the named entities the reference's data actually contains
  * (`&amp; &lt; &gt; &quot; &#39; &nbsp; &apos;`, plus the semicolon-less
  * legacy forms of those that HTML5 allows) and all numeric forms
  * (`&#123;`, `&#x1F4A9;`) with `html.unescape`'s replacement rules:
  * C1 refs (`&#128;`\u2013`&#159;`) map through the HTML5 windows-1252 table,
  * surrogates/out-of-range \u2192 U+FFFD, disallowed control/noncharacter
  * codepoints are dropped.
  */
object HtmlUnescape {
  private val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> "\u00a0")

  /** HTML5 legacy entities that also match WITHOUT a trailing semicolon
    * (CPython `html._html5` keys sans ';' \u2229 our subset; `apos` is
    * semicolon-only in HTML5). Longest-match order. */
  private val legacyNoSemi: Seq[(String, String)] = Seq(
    "quot" -> "\"", "nbsp" -> "\u00a0", "amp" -> "&", "lt" -> "<", "gt" -> ">")

  /** Numeric charrefs html.unescape rewrites rather than decoding directly
    * (CPython `html._invalid_charrefs`): NUL\u2192U+FFFD, 0x0D\u2192CR, and the
    * 0x80\u20130x9F block through the HTML5 windows-1252 mapping. */
  private val invalidCharrefs: Map[Int, String] = Map(
    0x00 -> "\ufffd", 0x0d -> "\r",
    0x80 -> "\u20ac", 0x81 -> "\u0081", 0x82 -> "\u201a", 0x83 -> "\u0192",
    0x84 -> "\u201e", 0x85 -> "\u2026", 0x86 -> "\u2020", 0x87 -> "\u2021",
    0x88 -> "\u02c6", 0x89 -> "\u2030", 0x8a -> "\u0160", 0x8b -> "\u2039",
    0x8c -> "\u0152", 0x8d -> "\u008d", 0x8e -> "\u017d", 0x8f -> "\u008f",
    0x90 -> "\u0090", 0x91 -> "\u2018", 0x92 -> "\u2019", 0x93 -> "\u201c",
    0x94 -> "\u201d", 0x95 -> "\u2022", 0x96 -> "\u2013", 0x97 -> "\u2014",
    0x98 -> "\u02dc", 0x99 -> "\u2122", 0x9a -> "\u0161", 0x9b -> "\u203a",
    0x9c -> "\u0153", 0x9d -> "\u009d", 0x9e -> "\u017e", 0x9f -> "\u0178")

  /** Codepoints html.unescape drops entirely (`html._invalid_codepoints`):
    * C0 controls minus HT/LF/FF/CR \u2014 so 0x0B (VT) IS dropped while 0x0C
    * (FF) is NOT \u2014 DEL+C1 handled above via charrefs but also dropped when
    * reached by hex value, FDD0\u2013FDEF, and the xFFFE/xFFFF-suffixed
    * noncharacters of every plane. */
  private def isInvalidCodepoint(cp: Int): Boolean =
    (cp >= 0x01 && cp <= 0x08) || cp == 0x0b || (cp >= 0x0e && cp <= 0x1f) ||
    (cp >= 0x7f && cp <= 0x9f) || (cp >= 0xfdd0 && cp <= 0xfdef) ||
    (cp & 0xfffe) == 0xfffe

  private def decodeNumeric(cp: Int): String =
    invalidCharrefs.get(cp) match {
      case Some(r) => r
      case None =>
        if (cp > 0x10ffff || (cp >= 0xd800 && cp <= 0xdfff)) "\ufffd"
        else if (isInvalidCodepoint(cp)) ""
        else String.valueOf(Character.toChars(cp))
    }

  /** Static decode used by both interpreted eval and generated code. */
  def decode(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c == '&') {
        if (i + 1 < str.length && str.charAt(i + 1) == '#') {
          // Numeric charref — html.unescape's _charref matches the digit
          // run with or WITHOUT a trailing semicolon ('&#38' -> '&',
          // '&#x26 x' -> '& x'); the semicolon, when present, is consumed.
          // The run length is unbounded in CPython (arbitrary-precision
          // int); we clamp the accumulator past 0x10FFFF, where every
          // value decodes to U+FFFD anyway, so the clamp is unobservable.
          val isHex = i + 2 < str.length &&
            (str.charAt(i + 2) == 'x' || str.charAt(i + 2) == 'X')
          val start = if (isHex) i + 3 else i + 2
          var j = start
          var v = 0L
          var more = true
          // ASCII digits ONLY — CPython's _charref matches [0-9]/[0-9a-fA-F];
          // Character.digit would also accept Arabic-Indic/fullwidth digits
          // and silently diverge from html.unescape on such input.
          def dig(ch: Char): Int =
            if (ch >= '0' && ch <= '9') ch - '0'
            else if (isHex && ch >= 'a' && ch <= 'f') ch - 'a' + 10
            else if (isHex && ch >= 'A' && ch <= 'F') ch - 'A' + 10
            else -1
          while (j < str.length && more) {
            val d = dig(str.charAt(j))
            if (d < 0) more = false
            else { v = math.min(v * (if (isHex) 16 else 10) + d, 0x110000L); j += 1 }
          }
          if (j > start) {
            out.append(decodeNumeric(v.toInt))
            i = if (j < str.length && str.charAt(j) == ';') j + 1 else j
          } else { out.append(c); i += 1 } // '&#'/'&#x' with no digits: literal
        } else {
        val semi = str.indexOf(';', i + 1)
        // entity bodies are short; anything overly long is literal text
        val repl: String =
          if (semi > i + 1 && semi - i <= 10) named.getOrElse(str.substring(i + 1, semi), null)
          else null
        if (repl != null) { out.append(repl); i = semi + 1 }
        else {
          // html.unescape also matches legacy entities with no semicolon
          legacyNoSemi.find { case (n, _) => str.startsWith(n, i + 1) } match {
            case Some((n, r)) => out.append(r); i += n.length + 1
            case None => out.append(c); i += 1
          }
        }
        }
      } else { out.append(c); i += 1 }
    }
    UTF8String.fromString(out.toString)
  }

  def apply(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(HtmlUnescapeExpr(ColumnBridge.expression(c)))
  }
}

case class HtmlUnescapeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = HtmlUnescape.decode(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlUnescape.decode($c)")
  override protected def withNewChildInternal(newChild: Expression): HtmlUnescapeExpr =
    copy(child = newChild)
  override def prettyName: String = "html_unescape"
}
