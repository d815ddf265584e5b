package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction with boilerplate removal — the first step
  * of every web-corpus pipeline (raw crawl HTML → training text):
  *
  *  1. script/style elements and comments removed;
  *  2. block-level tags become block boundaries;
  *  3. optionally ([[htmlMainText]]) boilerplate blocks are dropped by
  *    LINK DENSITY — a block whose visible text is ≥50% link text is
  *    chrome (nav bars, footers, related-links rails), the core
  *    heuristic of the Readability/jusText/trafilatura family;
  *  4. remaining tags stripped, entities decoded (named + numeric),
  *    whitespace normalized (runs collapse to one space inside a
  *    block, blocks join with one newline).
  *
  * Deterministic string → string (no DOM library, a regex/scan pass),
  * so it runs as a native expression in any scan and the extraction
  * is engine-portable for the oracle. Tag matching tolerates `>`
  * inside quoted attribute values.
  *
  * Reference surface: datarepo has no text-extraction operator; this
  * extends the engine's text-cleaning family (SURVEY §2 P28-P30).
  */
object HtmlText {

  def htmlText(c: Column): Column =
    Bridge.column(HtmlTextExpr(Bridge.expression(c), mainOnly = false))

  /** Boilerplate-filtered main content (link-density block filter). */
  def htmlMainText(c: Column): Column =
    Bridge.column(HtmlTextExpr(Bridge.expression(c), mainOnly = true))

  // title/noscript are head/fallback metadata, not content
  private val ScriptStyle =
    "(?is)<(script|style|title|noscript)\\b[^>]*>.*?</\\1\\s*>".r
  private val Comment = "(?s)<!--.*?-->".r
  private val BlockTag =
    ("(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote|section|article|" +
      "header|footer|nav|form|hr|pre|aside|main)\\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*>").r
  private val AnyTag = "(?s)<(?:[^>\"']|\"[^\"]*\"|'[^']*')*>".r
  private val Anchor = "(?is)<a\\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*>(.*?)</a\\s*>".r
  private val Entity = "&(#x?[0-9a-fA-F]+|[a-zA-Z]+);".r
  private val Named = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  private def decodeEntities(s: String): String =
    Entity.replaceAllIn(s, m => {
      val body = m.group(1)
      val out =
        if (body.startsWith("#x") || body.startsWith("#X"))
          try String.valueOf(Character.toChars(Integer.parseInt(body.drop(2), 16)))
          catch { case _: Exception => m.matched }
        else if (body.startsWith("#"))
          try String.valueOf(Character.toChars(body.drop(1).toInt))
          catch { case _: Exception => m.matched }
        else Named.getOrElse(body.toLowerCase(java.util.Locale.ROOT), m.matched)
      java.util.regex.Matcher.quoteReplacement(out)
    })

  private def visibleLen(block: String): Int =
    AnyTag.replaceAllIn(block, " ").replaceAll("\\s+", " ").trim.length

  /** Driver-side extraction (shared with the expression; exposed for
    * tests and the oracle's documentation).
    */
  def extract(html: String, mainOnly: Boolean): String = {
    if (html == null) return null
    val noScript = ScriptStyle.replaceAllIn(html, " ")
    val noComment = Comment.replaceAllIn(noScript, " ")
    // raw newlines in markup are whitespace, not structure — only
    // block TAGS create block boundaries
    val flat = noComment.replace('\r', ' ').replace('\n', ' ').replace('\t', ' ')
    val blocks = BlockTag.replaceAllIn(flat, "\n").split('\n')
    val kept = blocks.iterator.filter { b =>
      if (!mainOnly) true
      else {
        val total = visibleLen(b)
        if (total == 0) true // empty blocks drop below anyway
        else {
          val linkLen = Anchor.findAllMatchIn(b).map(m => visibleLen(m.group(1))).sum
          linkLen * 2 < total // boilerplate: half or more of the text is links
        }
      }
    }
    kept
      .map(b => decodeEntities(AnyTag.replaceAllIn(b, " "))
        .replaceAll("\\s+", " ").trim)
      .filter(_.nonEmpty)
      .mkString("\n")
  }
}

/** Native extraction expression: string html → extracted text. */
case class HtmlTextExpr(child: Expression, mainOnly: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (mainOnly) "graft_html_main_text" else "graft_html_text"

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      HtmlText.extract(v.asInstanceOf[UTF8String].toString, mainOnly))

  override protected def withNewChildInternal(c: Expression): HtmlTextExpr =
    copy(child = c)
}
