package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for pre-training corpora (the
  * Dolma/CCNet scrubbing stage: emails, phone numbers, IP addresses,
  * SSN-shaped ids replaced by typed placeholder tokens before the text
  * ships to training).
  *
  * Scale design: pure row-local regexp work — `regexp_count` +
  * chained `regexp_replace` column expressions, zero exchanges, no
  * UDFs. The patterns deliberately use only regex constructs with
  * identical semantics in Java's engine and RE2 (character classes,
  * bounded repetition, alternation — no backrefs, no lookarounds), so
  * an external auditor (the DuckDB oracle) can re-state detection and
  * redaction exactly; at 100 TB the scrub is a map-only pass that
  * pipelines into whatever write follows it.
  *
  * Reference anchor: engine brief's LLM-pipeline operator list; no
  * reference-repo counterpart (its rows are numeric weather/energy
  * readings).
  */
object Pii {

  /** (name, pattern, replacement token), applied in order. Patterns are
    * disjoint by construction (phone 3-3-4 vs SSN 3-2-4 digit groups
    * cannot overlap; emails/IPs are dot-shaped, never dash-shaped), so
    * the chain's output is order-independent — but the declared order
    * IS the contract the oracle replicates. */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<email>"),
    ("ip", "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}", "<ip>"),
    ("phone", "\\d{3}-\\d{3}-\\d{4}", "<phone>"),
    ("ssn", "\\d{3}-\\d{2}-\\d{4}", "<ssn>"))

  /** Per-type match count columns (`n_email`, `n_ip`, ...). Patterns
    * ride as `lit` arguments, never through SQL-literal parsing (which
    * would eat the `\d` escapes). */
  def counts(textCol: String): Seq[(String, Column)] =
    Patterns.map { case (name, pat, _) =>
      s"n_$name" -> regexp_count(col(textCol), lit(pat))
    }

  /** The redacted text: every pattern occurrence replaced by its typed
    * placeholder, applied in [[Patterns]] order. */
  def redact(textCol: String): Column =
    Patterns.foldLeft(col(textCol)) { case (acc, (_, pat, token)) =>
      regexp_replace(acc, pat, token)
    }

  /** Scrub report: the input plus per-type counts, `n_pii` total, and
    * the redacted text. Zero exchanges (spec-asserted). */
  def scrub(df: DataFrame, textCol: String = "text"): DataFrame = {
    val withCounts = counts(textCol).foldLeft(df) { case (acc, (name, c)) =>
      acc.withColumn(name, c)
    }
    withCounts
      .withColumn("n_pii", counts(textCol).map { case (n, _) => col(n) }.reduce(_ + _))
      .withColumn("redacted", redact(textCol))
  }
}
