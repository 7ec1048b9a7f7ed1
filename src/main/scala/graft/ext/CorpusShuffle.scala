package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Deterministic global corpus shuffle — the "randomize training order"
  * step that precedes sharding a corpus for a trainer. Each document
  * gets a pseudo-random but fully reproducible sort key
  * (`md5(seed || ':' || id)`), the corpus is globally ordered by that
  * key, and contiguous runs of `shardSize` documents become training
  * shards.
  *
  * The scale shape is the terasort one, same as
  * [[graft.dim.DimSecurity.assignDenseIds]] (W2):
  *   1. `repartitionByRange(key).sortWithinPartitions(key)` — a RANGE
  *      exchange, so every partition sorts in parallel and partition
  *      p's keys all precede partition p+1's (never a SinglePartition
  *      collapse — PlanSpec pins this);
  *   2. `zipWithIndex` — one job counting rows per partition, then a
  *      narrow map adding each partition's cumulative offset.
  * Equivalent to `row_number() OVER (ORDER BY key) − 1` but parallel:
  * the only driver-side state is one count per partition. Shard
  * assignment is then pure arithmetic (`pos DIV shardSize`), so shards
  * are exactly balanced (last one short) without any further shuffle —
  * a writer can `repartitionByRange($"shard_id")` and emit one file
  * per shard with data already in final order.
  *
  * Determinism: md5 keys are unique per distinct id for any practical
  * corpus, the range sort is total on them, and the seed string pins
  * the permutation — re-running on a retried/re-planned cluster gives
  * byte-identical shards (same argument as [[Sampling]]'s md5-bucket
  * contract).
  *
  * Reference ties: the reference pipeline loads in staged-file order
  * (`dags/sql/1. copy_to_raw.sql:29` COPYs the date-pathed CSV
  * listing as staged); a training-data
  * user needs the opposite — an order-free-of-source-locality — which
  * is exactly this operator.
  */
object CorpusShuffle {

  /** The pseudo-random sort key: hex md5 over `seed || ':' || id`. */
  def shuffleKey(idCol: String, seed: String) =
    md5(concat(lit(seed + ":"), col(idCol).cast("string"))).as("shuffle_key")

  /** The distributed-sort stage, exposed so PlanSpec can pin its
    * physical shape (RANGE exchange over `shuffle_key`). Emits
    * `(id, shuffle_key)` range-partitioned and sorted by key. The id
    * column keeps its ORIGINAL type (string ids are as valid as longs —
    * same contract as every other id-generic operator here; a null id
    * yields a null key, which range-sorts first). */
  private[graft] def rangeSorted(df: DataFrame, idCol: String, seed: String): DataFrame =
    df.select(col(idCol), shuffleKey(idCol, seed))
      .repartitionByRange(col("shuffle_key"))
      .sortWithinPartitions("shuffle_key")

  /** Global shuffle order: `(id, shuffle_key, pos, shard_id)` where
    * `pos` is the document's position in the seeded permutation and
    * `shard_id = pos DIV shardSize`. Determinism requires distinct
    * non-null ids (the md5 keys are then unique, so the order is
    * total); rows sharing an id — or with a null one — share a key and
    * their relative order is partition-dependent. */
  def order(df: DataFrame, idCol: String, seed: String, shardSize: Long): DataFrame = {
    require(shardSize > 0, s"shardSize must be positive, got $shardSize")
    val spark = df.sparkSession
    val sorted = rangeSorted(df, idCol, seed)
    // generic row passthrough: append (pos, shard_id) to whatever id
    // type the caller has — no cast, no assumed field layout
    val schema = StructType(sorted.schema.fields ++ Seq(
      StructField("pos", LongType, nullable = false),
      StructField("shard_id", LongType, nullable = false)))
    val rows = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i :+ i / shardSize)
    }
    spark.createDataFrame(rows, schema)
  }

  /** Manifest field order for [[verifyShards]]'s first-difference
    * verdict: cheapest-to-diagnose first (a doc-count mismatch names
    * the failure mode outright; the xor is the catch-all). */
  private val ManifestFields =
    Seq("n_docs", "n_tokens", "content_xor", "pos_min", "pos_max")

  /** The manifest's CONSUMER side (the x84/x86 audit discipline applied
    * to x87): given the RELEASE manifest and the shard set actually
    * received (as the re-derived `(ordered, docs)` pair), recompute the
    * manifest over what arrived and emit one verdict row per shard —
    * `status` ∈ `ok` (all five fields match), `mismatch` (+
    * `first_diff` = the first differing field in [[ManifestFields]]
    * order), `missing` (in the manifest, nothing received), or
    * `unexpected` (received, not in the manifest). The join is FULL
    * OUTER by design: a truncated release (missing shard) and a
    * spliced one (extra shard) must surface as rows, not vanish from
    * an inner join (the x84 completeness argument).
    *
    * Scale shape: one [[shardManifest]] recompute over the received
    * shards + a manifest-sized (shards, not docs) full-outer join —
    * the verdict table is dashboard-sized. */
  def verifyShards(manifest: DataFrame, ordered: DataFrame, docs: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    val cols = "shard_id" +: ManifestFields
    val m = manifest.select(cols.map(c => col(c).as(s"m_$c")): _*)
    val a = shardManifest(ordered, docs, idCol, textCol)
      .select(cols.map(c => col(c).as(s"a_$c")): _*)
    val firstDiff = ManifestFields.foldRight(lit(null).cast("string")) {
      case (f, acc) => when(!(col(s"m_$f") <=> col(s"a_$f")), f).otherwise(acc)
    }
    m.join(a, col("m_shard_id") === col("a_shard_id"), "full_outer")
      .select(
        coalesce(col("m_shard_id"), col("a_shard_id")).as("shard_id"),
        when(col("m_shard_id").isNull, "unexpected")
          .when(col("a_shard_id").isNull, "missing")
          .when(firstDiff.isNotNull, "mismatch")
          .otherwise("ok").as("status"),
        when(col("m_shard_id").isNotNull && col("a_shard_id").isNotNull,
          firstDiff).as("first_diff"))
  }

  /** SHARD MANIFEST — the release-integrity artifact written next to a
    * sharded training corpus (every published data release ships one:
    * per shard, how many documents, how many tokens, and a content
    * fingerprint a consumer can re-derive to detect truncated, swapped,
    * or re-ordered shards before a single training step runs). Per
    * `shard_id`: document count, exact token mass, an ORDER-FREE
    * 60-bit content fingerprint (XOR of each doc's
    * `md5(md5(id) || md5(text))`-prefix integer — XOR commutes, so the
    * fingerprint is stable under any aggregation order while any
    * single-doc corruption, omission, or cross-shard swap flips it;
    * the id inside the hash keeps identical twin texts from XOR-ing
    * out, and the fixed-width inner digests frame the two fields
    * UNAMBIGUOUSLY: a separator-based concat let ids containing the
    * separator collide — id `a#b`/text `c` vs id `a`/text `b#c` hashed
    * identically, so a cross-doc content swap among such docs XOR-ed
    * out and the check passed silently (review finding, round 17)),
    * and the position range (`pos_max − pos_min + 1 = n_docs`
    * iff the shard is contiguous).
    *
    * Shape at 100 TB: one id-keyed join attaches text to the
    * (id, pos, shard) spine ([[order]] deliberately drops the text —
    * the terasort exchange must never carry document bodies), then a
    * map-side-combined groupBy to shard cardinality. */
  def shardManifest(ordered: DataFrame, docs: DataFrame, idCol: String,
                    textCol: String): DataFrame =
    ordered.select(col(idCol), col("pos"), col("shard_id"))
      .join(docs.select(col(idCol), col(textCol)), Seq(idCol))
      // the shared 60-bit md5-prefix primitive (MinHash.shingleHash),
      // not an inline re-implementation
      .withColumn("__h", MinHash.shingleHash(concat(
        md5(col(idCol).cast("string")),
        md5(coalesce(col(textCol), lit(""))))))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(size(Ngrams.normTokens(col(textCol))).cast("long"),
          lit(0L))).as("n_tokens"),
        expr("bit_xor(__h)").as("content_xor"),
        min(col("pos")).as("pos_min"), max(col("pos")).as("pos_max"))
}
