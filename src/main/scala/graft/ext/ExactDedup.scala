package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact deduplication over a text (or any) column: hash-groupBy on the
  * normalized content, keep the smallest id as canonical.
  *
  * Scale shape: one hash-partition shuffle on the (fingerprint) key —
  * identical to a groupBy count. For 100 TB, group on the 128-bit
  * fingerprint rather than the full text so shuffle rows carry 16 bytes
  * + id instead of document bodies; collision probability of md5 at any
  * realistic corpus size is negligible (and a second exact pass within
  * groups can confirm if required).
  */
object ExactDedup {

  /** Per-distinct-content row: canonical (min) id, duplicate count, and
    * the content fingerprint. */
  def dedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        TextAnalysis.fingerprintMd5(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("dup_count"))
      .select(col("canonical_id"), col("dup_count"), col("fp"))
}
