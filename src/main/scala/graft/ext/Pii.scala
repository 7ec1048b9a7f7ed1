package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over document text — the scrubbing pass
  * every curation pipeline runs before training (emails, IPv4
  * addresses, NANP-style phone numbers), in the spirit of the public
  * RedPajama/Dolma rule sets.
  *
  * Everything here is per-row codegen'd regex work
  * (`regexp_extract_all` to count, `regexp_replace` to redact) — zero
  * shuffles, zero UDFs, so at 100 TB the pass is pure map-side
  * throughput pipelined into whatever shuffle the caller does next.
  * The patterns are deliberately written in the common subset of Java
  * regex (Spark) and RE2 (DuckDB, the oracle engine): character
  * classes, bounded repetition and `\b` word boundaries only — no
  * backreferences, no lookaround (RE2 has neither).
  *
  * Redaction replaces each match with a typed placeholder token
  * (`<EMAIL>`/`<IP>`/`<PHONE>`), preserving the surrounding text so
  * token-count-sensitive downstream stages ([[Packing]], [[Vocab]])
  * see a stable document length. Order matters and is fixed:
  * emails first (their local part may embed digits that the phone
  * pattern could otherwise nibble), then IPs, then phones.
  *
  * Reference ties: the reference pipeline's quality gates
  * (`dags/sql/2. check_loaded.sql:6-8`) gate loads on structural
  * predicates;
  * PII scrubbing is the text-corpus analogue its training-data users
  * need before anything ships to a trainer.
  */
object Pii {

  /** RFC-5322-lite email: local part, `@`, dotted domain, ≥2-letter
    * TLD. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (syntactic — no octet-range check, matching the
    * public scrubbing rule sets which over-redact rather than leak). */
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP-style dashed phone number (`NNN-NNN-NNNN`). */
  val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Match count of one pattern (codegen'd; no UDF). */
  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Redact all three PII classes with typed placeholders, in the
    * fixed email → IP → phone order. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  /** Per-document PII verdicts: counts per class, total, and the md5
    * fingerprint of the redacted text (the fingerprint — not the text —
    * is what the caller ships around, same convention as
    * [[ExactDedup]]).
    *
    * Each class is counted on the text AS THE REDACTION PASS SEES IT
    * (emails on the raw text, IPs on the email-redacted text, phones on
    * the email+IP-redacted text), so the counts are exactly the number
    * of placeholders [[redact]] inserts and `n_pii` is the number of
    * redacted spans. Counting every class independently on the raw text
    * would double-count overlaps — e.g. `1.2.3.4@example.com` is ONE
    * redacted span (an email) but also contains an IPv4 substring.
    *
    * Staged projections, same rationale as [[MinHash.signatures]]: each
    * intermediate redaction is a real column referenced twice (count +
    * next replace), so CollapseProject keeps it and every regex runs
    * once per row — six passes total (3 extract + 3 replace), which
    * PlanSpec pins for x40. */
  def annotate(df: DataFrame, idCol: String, textCol: String): DataFrame =
    annotateKeeping(df, Seq(idCol), textCol)

  /** [[annotate]] with an arbitrary carried-column spine — the shared
    * implementation of the per-doc verdicts and the per-group
    * [[audit]] (one staged-projection chain, so the two surfaces can
    * never count differently). */
  private def annotateKeeping(df: DataFrame, keep: Seq[String],
                              textCol: String): DataFrame = {
    val k = keep.map(col)
    df.select(k :+
        countMatches(col(textCol), emailRe).as("n_emails") :+
        regexp_replace(col(textCol), emailRe, "<EMAIL>").as("__t1"): _*)
      .select(k :+ col("n_emails") :+
        countMatches(col("__t1"), ipv4Re).as("n_ips") :+
        regexp_replace(col("__t1"), ipv4Re, "<IP>").as("__t2"): _*)
      .select(k :+ col("n_emails") :+ col("n_ips") :+
        countMatches(col("__t2"), phoneRe).as("n_phones") :+
        md5(regexp_replace(col("__t2"), phoneRe, "<PHONE>")).as("redacted_fp"): _*)
      .withColumn("n_pii", col("n_emails") + col("n_ips") + col("n_phones"))
  }

  /** Per-group PII AUDIT — the data card's privacy section (Dolma's
    * data sheet and every release audit report exactly this): per
    * `groupCol`, document count, redacted-span counts per PII class,
    * how many documents carry ANY PII, and the PII-document rate. The
    * counts are [[annotate]]'s (the sequential-redaction counting, so
    * the audit total always equals the number of placeholders
    * [[redact]] would insert — one definition of "a PII span" across
    * the engine).
    *
    * Scale shape: the regex pass is the same zero-shuffle map-side
    * work as [[annotate]] (the fingerprint column is pruned by the
    * rollup), followed by ONE map-side-combined groupBy to group
    * cardinality — a release audit over 100 TB is a full scan and a
    * dashboard-sized result, nothing in between. */
  def audit(df: DataFrame, idCol: String, textCol: String,
            groupCol: String): DataFrame =
    annotateKeeping(df, Seq(groupCol, idCol), textCol)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_emails")).as("n_emails"),
        sum(col("n_ips")).as("n_ips"),
        sum(col("n_phones")).as("n_phones"),
        count(when(col("n_pii") > 0, 1)).as("docs_with_pii"))
      .withColumn("pii_doc_rate",
        col("docs_with_pii").cast("double") / col("n_docs").cast("double"))
}
