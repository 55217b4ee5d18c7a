package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for pretraining corpora — the regex sweep every released
  * dataset pipeline runs (C4 strips bad words; Dolma/FineWeb redact
  * emails / phone numbers / IP addresses before publication). Pure
  * per-row codegen'd regex work: zero shuffle at any scale, and the
  * patterns are RE2-safe (no backtracking constructs) so the same sweep
  * runs unchanged on engines with linear-time regex.
  *
  * Order matters and is fixed: emails first (their local part can contain
  * digit runs a later number pattern would mangle), then IPv4 (dotted
  * digit quads), then phone-shaped digit groups. */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Count of `re` matches in `c` (codegen'd regexp_count). */
  def matches(c: Column, re: String): Column = regexp_count(c, lit(re))

  /** `c` with emails → [EMAIL], IPv4s → [IP], phone-shaped groups →
    * [PHONE], applied in that order. */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")
}
