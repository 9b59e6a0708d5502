package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Column-level building blocks for the engine.
  *
  * These reproduce the scalar-function surface of the reference
  * (SURVEY.md §2-F), re-expressed as codegen-friendly compositions of
  * `org.apache.spark.sql.functions` — no UDFs anywhere.
  */
object GraftFunctions {

  /** F2 — deterministic sampling cohort (import_events.py:114).
    *
    * Redshift `STRTOL(SUBSTRING(id FROM 0 FOR 8), 16) % 100`: PG substring
    * semantics clamp the start to 1 so `FROM 0 FOR 8` yields the FIRST 7
    * characters (not 8). `conv` parses them base-16.
    *
    * NULL, empty, or non-hex ids yield a NULL cohort, which fails every
    * `cohort < pct` predicate — such rows belong to NO sample tier (the
    * email-events trap: flow_id is nullable, import_email_events.py:7,
    * and the filter at import_events.py:114-117 silently drops them).
    */
  def hexPrefixCohort(id: Column, chars: Int = 7, mod: Int = 100): Column = {
    val prefix = substring(id, 1, chars)
    when(prefix.rlike("^[0-9a-fA-F]+$"),
      conv(prefix, 16, 10).cast(LongType) % mod)
  }

  /** Cohort for a numeric id: hash to hex first so cohorts are uniform
    * (the reference's uids are already hex strings; test ids are ints). */
  def numericCohort(id: Column, mod: Int = 100): Column =
    hexPrefixCohort(md5(id.cast("string")), 7, mod)

  /** F1 — epoch seconds BIGINT → timestamp (import_events.py:113). */
  def epochSecondsToTs(secs: Column): Column = timestamp_seconds(secs)

  /** Z-ORDER value: bit-interleave the low `bits` of two non-negative
    * longs (a → even positions, b → odd), the space-filling curve key
    * behind multi-column data skipping — rows sorted by z cluster in
    * BOTH dimensions at once, so per-file min/max ranges stay tight on
    * a AND b where a plain sort leaves the second column full-range
    * (quantified by Analytics.zOrderAudit). Pure integer bit algebra,
    * mirrored exactly by a DuckDB list_sum. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    (0 until bits).map { i =>
      (shiftright(a.cast(LongType), i).bitwiseAND(lit(1L)) * (1L << (2 * i))) +
        (shiftright(b.cast(LongType), i).bitwiseAND(lit(1L)) *
          (1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** F5 — `::DATE` day bucketing of a timestamp. */
  def dayOf(ts: Column): Column = to_date(ts)

  /** B8 — empty-string backfill (import_flow_events.py:211-219).
    * Redshift CSV ingest yields '' (not NULL) for blank fields; the
    * reference backfills only when the primary is blank. NOT coalesce. */
  def emptyBackfill(primary: Column, fallback: Column): Column =
    when(primary === "", fallback).otherwise(primary)

  /** F3 — `SUBSTRING(type, 16, 64)`: extract the continued-from flow id
    * out of `flow.continued.${flow_id}` (import_flow_events.py:244). */
  def continuedFrom(eventType: Column): Column = substring(eventType, 16, 64)

  /** F4 — `SPLIT_PART(s, '.', n)` (import_flow_events.py:273-274).
    * SPLIT_PART returns '' when n is out of range; element_at would throw,
    * so guard with the array size. 1-based like the reference. */
  def splitPart(s: Column, sep: String, n: Int): Column = {
    val arr = split(s, java.util.regex.Pattern.quote(sep))
    when(size(arr) >= n, element_at(arr, n)).otherwise(lit(""))
  }

  /** Whitespace tokenizer used across the text-analysis operators. */
  def tokens(text: Column): Column = split(text, " ")
}
