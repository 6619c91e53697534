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
  * (`&amp; &lt; &gt; &quot; &#39; &nbsp; &apos;`) plus all numeric forms
  * (`&#123;`, `&#x1F4A9;`), mirroring `html.unescape` for that subset.
  */
object HtmlUnescape {
  private val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> "\u00a0")

  /** Static decode used by both interpreted eval and generated code. */
  def decode(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c == '&') {
        val semi = str.indexOf(';', i + 1)
        // entity bodies are short; anything overly long is literal text
        if (semi > i + 1 && semi - i <= 10) {
          val body = str.substring(i + 1, semi)
          val repl: String =
            if (body.startsWith("#x") || body.startsWith("#X")) {
              try String.valueOf(Character.toChars(Integer.parseInt(body.substring(2), 16)))
              catch { case _: Exception => null }
            } else if (body.startsWith("#")) {
              try String.valueOf(Character.toChars(Integer.parseInt(body.substring(1))))
              catch { case _: Exception => null }
            } else named.getOrElse(body, null)
          if (repl != null) { out.append(repl); i = semi + 1 }
          else { out.append(c); i += 1 }
        } else { out.append(c); i += 1 }
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
