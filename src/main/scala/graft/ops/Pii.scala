package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrub pass every training-data
  * pipeline runs before export (emails, IP addresses, phone numbers,
  * long ID/account numbers). Detection and replacement are plain
  * regular expressions chosen from the Java-regex ∩ RE2 common subset
  * (no lookaround, no backreferences), so the SQL oracle replays every
  * count and every redacted byte bit-for-bit.
  *
  * Scale shape: ZERO shuffle. Counting is `regexp_extract_all` and
  * redaction a fixed chain of `regexp_replace` — per-row codegen'd
  * string expressions that pipeline with the scan, so scrubbing 100 TB
  * costs one pass. No UDF, no dictionary, no state.
  *
  * Semantics notes:
  *   - counts are computed on the ORIGINAL text per pattern; patterns
  *     can overlap (an E.164 phone is also a long digit run), so the
  *     per-kind counts are independent detectors, not a partition;
  *   - redaction applies the patterns SEQUENTIALLY in a fixed order
  *     (email, IP, phone, number) — both engines apply the same order,
  *     so overlapping matches resolve identically.
  */
object Pii {

  /** Email addresses (the RFC-ish practical subset). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (word-bounded; no lookaround so 5-octet strings
    * match on their first four — acceptable for a scrub pass, which
    * over-redacts by design).
    */
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** E.164-style international phone numbers (+ then 7-15 digits). */
  val PhoneRe = "\\+[0-9]{7,15}"

  /** Long digit runs (9+): account ids, SSN-like, card-like numbers. */
  val LongNumRe = "\\b[0-9]{9,}\\b"

  /** The sequential redaction chain: (pattern, replacement token). */
  val Chain: Seq[(String, String)] = Seq(
    EmailRe -> "<EMAIL>", Ipv4Re -> "<IP>",
    PhoneRe -> "<PHONE>", LongNumRe -> "<NUM>")

  private def countOf(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** Redacted text: the fixed chain applied in order. */
  def redacted(text: Column): Column =
    Chain.foldLeft(text) { case (t, (re, tok)) =>
      regexp_replace(t, re, tok)
    }

  /** Per-document PII profile: one count per detector plus the overall
    * flag — the triage readout a pipeline thresholds or routes on.
    */
  def piiStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.select(col("doc_id"),
        countOf(t, EmailRe).as("n_emails"),
        countOf(t, Ipv4Re).as("n_ips"),
        countOf(t, PhoneRe).as("n_phones"),
        countOf(t, LongNumRe).as("n_longnums"))
      .withColumn("has_pii",
        col("n_emails") + col("n_ips") + col("n_phones") + col("n_longnums") > 0)
  }

  /** Redaction result per document: the scrubbed text plus the byte
    * evidence (length delta and portable fingerprint) that makes the
    * pass value-checkable without shipping the full text downstream.
    */
  def redact(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.select(col("doc_id"),
      redacted(t).as("red_text"),
      length(t).cast("long").as("in_chars"))
      .select(col("doc_id"), col("in_chars"),
        length(col("red_text")).cast("long").as("out_chars"),
        TextOps.portableHash(col("red_text")).as("red_fp"))
  }
}
