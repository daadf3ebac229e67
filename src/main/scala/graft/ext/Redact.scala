package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII / pattern redaction for training corpora.
  *
  * A redaction pass is an ordered list of (name, regex, token) rules;
  * each rule contributes a per-row match count (for audit and
  * rejection-rate stats) computed on the ORIGINAL text, then a global
  * replace applied in rule order. Patterns are written in the
  * RE2-compatible subset (no lookaround, no backreferences) so an
  * external engine can reproduce them bit-for-bit.
  *
  * Scale: pure in-row Column expressions (`regexp_extract_all` +
  * `regexp_replace`) — scan-speed, whole-stage codegen, no shuffle,
  * no UDF. At 100 TB this runs at parquet-read speed and the counts
  * aggregate map-side.
  */
object Redact {

  /** One redaction rule: RE2-subset regex → replacement token. */
  final case class Rule(name: String, pattern: String, token: String)

  /** Default PII battery: emails, IPv4 literals, international-format
    * phone numbers. Patterns deliberately conservative (precision over
    * recall) — a redaction false-positive destroys real tokens. */
  val pii: Seq[Rule] = Seq(
    Rule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    Rule("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    Rule("phone", "\\+\\d{1,3}-\\d{3}-\\d{3,4}-\\d{3,4}", "<PHONE>"))

  /** Per-rule match counts on the untouched text (audit signal). */
  def counts(text: Column, rules: Seq[Rule] = pii): Seq[Column] =
    rules.map(r =>
      size(regexp_extract_all(text, lit(r.pattern), lit(0))).as(s"n_${r.name}"))

  /** The redacted text: rules applied in order. */
  def scrub(text: Column, rules: Seq[Rule] = pii): Column =
    rules.foldLeft(text)((c, r) => regexp_replace(c, lit(r.pattern), lit(r.token)))

  /** Redact `textCol` in place and append one `n_<rule>` count column
    * per rule (counted before redaction). */
  def redact(df: DataFrame, textCol: String, rules: Seq[Rule] = pii): DataFrame = {
    val original = col(textCol)
    val kept = df.columns.toSeq.map {
      case c if c == textCol => scrub(original, rules).as(textCol)
      case c                 => col(c)
    }
    df.select(kept ++ counts(original, rules): _*)
  }
}
