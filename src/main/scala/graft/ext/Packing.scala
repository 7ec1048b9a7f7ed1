package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing for pre-training batch assembly: lay the corpus out
  * in a deterministic document order (concat-and-chunk, the GPT-style
  * packing), and compute for every document its global token offset and
  * the context-window bins it lands in. The core is an EXCLUSIVE prefix
  * sum of token counts over the document order — computed with the same
  * two-pass distributed shape as [[graft.sa.Analytics.scalableRank]]:
  * range-partition by the order key, per-partition totals to the driver
  * (one long per partition — algorithm state, not data), then a running
  * offset per partition. No single-partition window anywhere, so the
  * layout computation scales to any corpus a sort scales to.
  */
object Packing {

  /** The distributed-sort stage of the prefix sum over an ARBITRARY
    * per-document cost column (whitespace tokens, BPE pieces — any
    * unit a budget is priced in), range-partitioned in document
    * order. NULL costs → 0, not a null the prefix-sum closures would
    * unbox into an NPE (sibling operators null-propagate; a layout
    * computation must instead keep every document). */
  private[graft] def orderedCounts(counts: DataFrame, idCol: String,
                                   countCol: String): DataFrame =
    counts.select(col(idCol),
        coalesce(col(countCol).cast("long"), lit(0L)).as("n_tokens"))
      .repartitionByRange(col(idCol).asc)
      .sortWithinPartitions(col(idCol).asc)

  /** [[orderedCounts]] over whitespace token counts — exposed so
    * PlanSpec can pin its physical shape: the Exchange must be RANGE —
    * never a SinglePartition collapse. */
  private[graft] def orderedTokenCounts(docs: DataFrame, idCol: String,
                                        textCol: String): DataFrame =
    orderedCounts(
      docs.select(col(idCol),
        size(Ngrams.normTokens(col(textCol))).cast("long").as("n_tokens")),
      idCol, "n_tokens")

  /** @return (id, n_tokens, offset, bin_start, bin_end) — `offset` the
    *         document's first-token position in the global concatenated
    *         stream, `bin_*` the first/last `windowTokens`-sized context
    *         windows it touches (empty docs: bin_end = bin_start). */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    windowTokens: Int): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be positive, got $windowTokens")
    packOrdered(orderedTokenCounts(docs, idCol, textCol), windowTokens)
  }

  /** [[packSequences]] over PRECOMPUTED per-document costs — the form
    * a real batch-assembly stage runs once a trained tokenizer exists
    * (budgets are priced in the tokenizer's units, not whitespace
    * tokens — x107 composes this with [[Bpe.pieceCounts]]). Same
    * distributed prefix sum, same output contract; the count column is
    * renamed `n_tokens` in the output regardless of its input name. */
  def packCountedSequences(counts: DataFrame, idCol: String,
                           countCol: String, windowTokens: Int): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be positive, got $windowTokens")
    packOrdered(orderedCounts(counts, idCol, countCol), windowTokens)
  }

  private def packOrdered(counted: DataFrame, windowTokens: Int): DataFrame = {
    val spark = counted.sparkSession
    // Persisted across the two passes (per-partition totals, then the
    // running-offset map) so the tokenize + range shuffle runs ONCE and
    // — more importantly — both passes see the SAME partition contents:
    // without materialization the offset pass re-executes the lineage,
    // and a nondeterministic input could range-partition differently
    // than the pass the totals were collected from, silently skewing
    // every offset. MEMORY_AND_DISK spills instead of evicting, so the
    // blocks never fall back to recompute. Persisting the DATAFRAME
    // (not the derived RDD) keeps the cache in the CacheManager, so the
    // caller-owned release is `spark.catalog.clearCache()` (the
    // [[MinHash]] signature-table contract; a raw `rdd.persist` would
    // be invisible to it). The returned (lazy) plan reads these blocks,
    // so release only after the result is materialized.
    val cached = counted.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rdd = cached.rdd
    val partSums = rdd.mapPartitions(it =>
      Iterator.single(it.map(_.getLong(1)).sum)).collect()
    val offsets = partSums.scanLeft(0L)(_ + _)
    val withOffset = rdd.mapPartitionsWithIndex { (pid, it) =>
      var before = offsets(pid)
      it.map { r =>
        val off = before
        before += r.getLong(1)
        Row(r.get(0), r.getLong(1), off)
      }
    }
    val schema = StructType(counted.schema.fields ++
      Seq(StructField("offset", LongType, nullable = false)))
    spark.createDataFrame(withOffset, schema)
      .withColumn("bin_start", expr(s"offset DIV $windowTokens"))
      .withColumn("bin_end",
        when(col("n_tokens") === 0, col("bin_start"))
          .otherwise(expr(s"(offset + n_tokens - 1) DIV $windowTokens")))
  }

  /** The WINDOW MANIFEST — the packed layout pivoted to what a batch
    * loader actually consumes: one row per (window, document segment)
    * with the segment's offset inside the window, its token length,
    * and whether it is the document's head/tail (the flags an
    * attention-mask builder keys on — a packed window must not attend
    * across segment boundaries, and a continuation segment is not a
    * document start). Derived from [[packSequences]]' layout by pure
    * integer arithmetic: document at global offset o with t tokens
    * intersects window k on `[max(0, o − kW), min(W, o + t − kW))`.
    * Zero-token documents contribute no segment (nothing to load —
    * they remain accounted in the layout itself, the x26 grain).
    *
    * Scale shape: one narrow explode over `sequence(bin_start,
    * bin_end)` (output is manifest-sized — Θ(tokens/W) segments
    * total); no join, no shuffle beyond the layout's own prefix
    * sum. */
  def windowManifest(packed: DataFrame, idCol: String,
                     windowTokens: Int): DataFrame =
    manifestRows(packed, idCol, windowTokens)
      .select(col("bin"), col(idCol), col("bin_offset"), col("seg_len"),
        col("is_head"), col("is_tail"))

  /** [[windowManifest]] with the document's global `offset` RETAINED —
    * the internal grain [[TokenIds.windowTokenIds]] slices ids with
    * (re-joining `packed` just to recover the offset would pay one
    * extra manifest-sized exchange). The public manifest is a
    * projection of this. */
  private[ext] def manifestRows(packed: DataFrame, idCol: String,
                                windowTokens: Int): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be positive, got $windowTokens")
    val w = lit(windowTokens.toLong)
    // head/tail flags come from the packed frame's OWN bin_start /
    // bin_end — never recomputed from the caller's windowTokens — and
    // the geometry (which genuinely needs W) is guarded: a W that
    // disagrees with the one the frame was packed under must fail loud
    // per-row, not silently emit negative bin_offset / garbage seg_len.
    // The guard wraps the selected `bin` column so column pruning can
    // never drop it.
    val checkedBin = when(col("bin_start") === expr(s"offset DIV $windowTokens"),
      col("bin")).otherwise(raise_error(concat(
      lit(s"windowManifest: windowTokens=$windowTokens disagrees with the " +
        "packed layout (bin_start != offset DIV W) at id="),
      col(idCol).cast("string"))))
    packed.filter(col("n_tokens") > 0)
      .select(col(idCol), col("n_tokens"), col("offset"),
        col("bin_start"), col("bin_end"),
        explode(sequence(col("bin_start"), col("bin_end"))).as("bin"))
      .withColumn("bin_offset",
        greatest(lit(0L), col("offset") - col("bin") * w))
      .withColumn("seg_len",
        least(w, col("offset") + col("n_tokens") - col("bin") * w) -
          col("bin_offset"))
      .withColumn("is_head", col("bin") === col("bin_start"))
      .withColumn("is_tail", col("bin") === col("bin_end"))
      .select(checkedBin.as("bin"), col(idCol), col("bin_offset"),
        col("seg_len"), col("is_head"), col("is_tail"), col("offset"))
  }

  /** PACKED-LAYOUT EFFICIENCY CARD — the batch-assembly audit a recipe
    * publishes next to its window size choice: over a
    * [[windowManifest]], the distribution of segments per window (how
    * fragmented the attention masks get), the head-vs-continuation
    * split (continuation segments ARE the document boundary crossings
    * — each one is a doc attending across a window edge it must be
    * masked from), and the padding waste (concat-and-chunk fills every
    * window except the stream's last, so `padding_tokens` is nonzero
    * only on the final window — a property, not an observation;
    * WindowManifestSpec pins it along with Σ window_tokens =
    * Σ n_tokens).
    *
    * One row per distinct segments-per-window count:
    * `(segs_per_window, n_windows, window_tokens, padding_tokens,
    * head_segments, continuation_segments)`.
    *
    * Scale shape: two map-side-combined aggregations — window grain
    * (bin-keyed, manifest-sized input) then bucket grain (≤ the max
    * segment count, dozens of rows). Exact int64 sums throughout. */
  def layoutCard(manifest: DataFrame, windowTokens: Int): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be positive, got $windowTokens")
    val w = lit(windowTokens.toLong)
    manifest.groupBy("bin")
      .agg(count(lit(1)).as("__segs"),
        sum("seg_len").as("__toks"),
        sum(when(col("is_head"), 1L).otherwise(0L)).as("__heads"))
      .groupBy(col("__segs").as("segs_per_window"))
      .agg(count(lit(1)).as("n_windows"),
        sum("__toks").as("window_tokens"),
        sum(w - col("__toks")).as("padding_tokens"),
        sum("__heads").as("head_segments"),
        sum(col("__segs") - col("__heads")).as("continuation_segments"))
  }
}
