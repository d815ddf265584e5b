package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Text cleaning for training-data pipelines: PII redaction, URL /
  * domain extraction, unicode + whitespace normalization. All pure
  * scan work; every pattern is written in the common subset of Java
  * regex and RE2 so the DuckDB oracle applies the IDENTICAL pattern
  * text — the patterns are spliced into the oracle SQL from these
  * constants, the two sides cannot drift.
  */
object TextClean {

  /** Conservative, engine-portable PII patterns (no lookaround — RE2
    * has none).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  /** Scheme + authority of a URL; group 1 is the host. */
  val UrlHostRe = "https?://([A-Za-z0-9.-]+)"

  def countMatches(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  /** Emails first (they contain dots and digits an IP/phone pass could
    * nibble at), then IPs, then phones.
    */
  def redactPii(c: Column): Column = {
    val noEmail = regexp_replace(c, EmailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Re, "<IP>")
    regexp_replace(noIp, PhoneRe, "<PHONE>")
  }

  /** Host of the first URL in the text ('' when none). */
  def urlHost(c: Column): Column = regexp_extract(c, UrlHostRe, 1)

  /** Registrable-ish domain: last two labels of the host. */
  def domainOf(host: Column): Column = {
    val parts = split(host, "\\.")
    when(size(parts) >= 2,
      concat_ws(".", element_at(parts, -2), element_at(parts, -1)))
      .otherwise(host)
  }

  /** Unicode NFC + control-char strip + whitespace collapse + trim —
    * the canonicalization pass run before hashing/dedup so visually
    * identical docs hash identically. NFC via the native expression
    * (Spark has no builtin); DuckDB mirrors with nfc_normalize.
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(Bridge.column(NfcNormalize(Bridge.expression(c))),
        "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
      "\\s+", " "))

  object Sql {
    def countMatches(x: String, re: String): String =
      s"CAST(len(regexp_extract_all($x, '$re')) AS BIGINT)"
    def redactPii(x: String): String =
      s"""regexp_replace(regexp_replace(regexp_replace($x,
         | '$EmailRe', '<EMAIL>', 'g'),
         | '$Ipv4Re', '<IP>', 'g'),
         | '$PhoneRe', '<PHONE>', 'g')""".stripMargin.replace("\n", "")
    def urlHost(x: String): String =
      s"coalesce(regexp_extract($x, '$UrlHostRe', 1), '')"
    def domainOf(host: String): String =
      s"""(CASE WHEN len(string_split($host, '.')) >= 2
         | THEN string_split($host, '.')[-2] || '.' || string_split($host, '.')[-1]
         | ELSE $host END)""".stripMargin.replace("\n", "")
    def normalizeText(x: String): String =
      s"""trim(regexp_replace(regexp_replace(nfc_normalize($x),
         | '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
         | '\\s+', ' ', 'g'))""".stripMargin.replace("\n", "")
  }
}

/** Unicode NFC normalization (java.text.Normalizer) — a native
  * expression because Spark has no builtin; DuckDB's nfc_normalize is
  * the oracle mirror. Composed (NFC) form is the hashing-stable choice:
  * é as one code point equals é as e+combining-acute after it.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc_normalize"

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}
