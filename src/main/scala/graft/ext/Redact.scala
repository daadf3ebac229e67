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

  // ---- checksum-verified identifiers --------------------------------
  // A digit run shaped like a card number usually ISN'T one; redaction
  // and leak auditing need the checksum to tell account numbers from
  // order ids. Both validators are pure Column expressions (folds over
  // the char array — scan-speed, no UDF) in integer arithmetic that
  // any engine reproduces bit-for-bit.

  /** 10^k mod 97 for k = 0..95 (the full multiplicative period) —
    * lets mod-97 of an arbitrarily long digit string be a SUM of
    * digit·power products instead of a sequential big-int fold. Also
    * interpolated into oracle SQL as a literal list. */
  val pow97: IndexedSeq[Int] =
    Iterator.iterate(1)(p => p * 10 % 97).take(96).toVector

  private def chars(s: Column): Column =
    filter(split(s, ""), c => c =!= "")

  /** Luhn mod-10 validity of a digits-only string (ISO/IEC 7812):
    * doubling every second digit from the right (subtracting 9 above
    * 9), the total must divide by 10. False for empty/non-digit-run
    * input lengths outside [2, 19]. */
  def luhnValid(num: Column): Column = {
    val ds = chars(num)
    val n = size(ds)
    val total = aggregate(sequence(lit(1), n), lit(0), (acc, i) => {
      val d = element_at(ds, i).cast("int")
      val dbl = d * 2 - when(d * 2 > 9, lit(9)).otherwise(lit(0))
      // position from the right r = n-i+1; double when r is even
      acc + when((n - i) % 2 === 1, dbl).otherwise(d)
    })
    when(n.between(2, 19), total % 10 === 0).otherwise(lit(false))
  }

  /** IBAN mod-97 validity (ISO 13616): first four chars rotated to
    * the end, letters expanded A→10..Z→35, and the resulting digit
    * string must be ≡ 1 (mod 97). The mod rides the [[pow97]] table —
    * one in-row sum, no big-int, no fold-carried state. */
  def ibanValid(iban: Column): Column = {
    val rot = concat(substring(iban, 5, 34), substring(iban, 1, 4))
    val digs = chars(concat_ws("", transform(chars(rot), c =>
      when(c.between("0", "9"), c)
        .otherwise((ascii(c) - 55).cast("string")))))
    val n = size(digs)
    val powers = array(pow97.map(lit): _*)
    val total = aggregate(sequence(lit(1), n), lit(0), (acc, i) =>
      acc + element_at(digs, i).cast("int") * element_at(powers, n - i + 1))
    when(length(iban).between(15, 34) &&
      iban.rlike("^[A-Z]{2}[0-9]{2}[A-Z0-9]+$"), total % 97 === 1)
      .otherwise(lit(false))
  }

  /** Digit runs (13–19 long) in `text` that pass the Luhn check —
    * the candidates worth redacting as payment-card numbers. */
  def verifiedCards(text: Column): Column =
    filter(regexp_extract_all(text, lit("\\b\\d{13,19}\\b"), lit(0)),
      c => luhnValid(c))
}
