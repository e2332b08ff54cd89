package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Inference-proof encoding for STRING partition-directory values of
  * the at-rest posting indexes (x11 grams, x49c tokens).
  *
  * Why (r17 ADVICE): a partitioned parquet read re-infers partition
  * COLUMN TYPES from the directory names
  * (`spark.sql.sources.partitionColumnTypeInference.enabled`, default
  * true). A corpus whose grams/tokens all parse numerically would have
  * its partition column re-typed — collapsing distinct string keys that
  * normalize to the same number ("007" and "7.0" as doubles) and
  * silently desynchronizing df/candidate counts from the text-explode
  * oracle. That never fires on this corpus (any alphabetic key forces
  * string inference), but it was an undocumented corpus assumption.
  *
  * The encoding removes the assumption structurally: the directory
  * value is `"g" + HEX(utf8(key))` — the leading alpha makes numeric
  * inference impossible for EVERY key, and hex keeps any key
  * directory-name-safe (no escaping, no case-folding hazards on
  * case-insensitive filesystems, since hex is uppercase-only). The raw
  * key is kept as a DATA column in the same files, so readers consume
  * exact original values and only the PRUNING predicate speaks the
  * encoded form. Probe literals encode driver-side with
  * [[encodeLiteral]] — planning-time partition pruning is unchanged
  * (PlanSpec gates PartitionFilters on the encoded column).
  *
  * At 100 TB the documented layout swap (key → bounded hash bucket)
  * subsumes this: an integer bucket id is inference-stable by
  * construction. This helper is the exact-key layout's equivalent
  * guarantee. */
object PartitionKeys {
  /** Column form: `concat("g", hex(key))`. */
  def encode(key: Column): Column = concat(lit("g"), hex(key))

  /** Driver-side literal form, bit-compatible with [[encode]] (Spark's
    * `hex` emits uppercase hex of the UTF-8 bytes). */
  def encodeLiteral(key: String): String =
    "g" + key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => f"${b & 0xff}%02X").mkString
}
