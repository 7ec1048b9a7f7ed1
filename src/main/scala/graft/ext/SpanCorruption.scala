package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Span-corruption objective construction — the T5/UL2 pre-training
  * recipe's example-building step (Raffel et al. 2020 §3.1.4: corrupt
  * ~15% of tokens in spans of mean length 3, replace each span with a
  * sentinel, train to reconstruct): given a corruption rate `r` and a
  * span length `L`, mark token position p a span START when its
  * seeded hash bucket falls under `r/L` (expected corrupted fraction
  * ≈ r), corrupt `[p, p+L−1]`, and merge overlapping/adjacent marks
  * into MAXIMAL spans (the islands idiom — T5's own sampler never
  * emits adjacent sentinels either). Output is the span table a
  * materializer consumes: `(id, span_idx, start_pos, end_pos,
  * span_len)` with sentinel numbering `span_idx` ordered by position.
  *
  * DETERMINISM over T5's RNG, deliberately: the published sampler
  * draws spans with an RNG, which is irreproducible across engines,
  * partitionings and retries; the engine-wide substitute is the
  * seeded-hash draw ([[Sampling.hashBucket]] over `seed:id:pos` — the
  * x60 fractional-copy precedent at the token grain). Same expected
  * statistics, bit-exact replay anywhere.
  *
  * Scale shape: one narrow projection → position explode (the
  * corpus-proportional row count, same grain as every gram operator)
  * → per-doc window max (spanLen-bounded frame) → islands rollup —
  * one hash exchange on the doc id shared by the windows, rollup to
  * span cardinality. No join, no driver state, no RNG.
  */
object SpanCorruption {

  /** Maximal corruption spans per document. Token-less docs emit no
    * spans ([[audit]] still reports them). */
  def spans(docs: DataFrame, idCol: String, textCol: String,
            corruptionRate: Double, spanLen: Int, seed: String): DataFrame = {
    require(corruptionRate > 0 && corruptionRate <= 1,
      s"corruptionRate must be in (0,1], got $corruptionRate")
    require(spanLen >= 1, s"spanLen must be >= 1, got $spanLen")
    val startThr = math.round(corruptionRate / spanLen * Sampling.Denom)
    val byPos = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val marked = docs
      .select(col(idCol), Ngrams.normTokens(col(textCol)).as("__toks"))
      .select(col(idCol), posexplode(col("__toks")).as(Seq("__pos", "__tok")))
      .withColumn("__start",
        Sampling.hashBucket(concat_ws(":", lit(seed), col(idCol),
          col("__pos"))) < lit(startThr))
      .withColumn("__corrupt",
        max(col("__start").cast("int"))
          .over(byPos.rowsBetween(-(spanLen - 1).toLong, Window.currentRow))
          === 1)
    marked.filter(col("__corrupt"))
      .withColumn("__island", col("__pos") - row_number().over(byPos))
      .groupBy(col(idCol), col("__island"))
      .agg(min(col("__pos")).cast("long").as("start_pos"),
        max(col("__pos")).cast("long").as("end_pos"),
        count(lit(1)).as("span_len"))
      .withColumn("span_idx",
        row_number().over(Window.partitionBy(col(idCol))
          .orderBy(col("start_pos"))).cast("long") - 1L)
      .select(col(idCol), col("span_idx"), col("start_pos"),
        col("end_pos"), col("span_len"))
  }

  /** MATERIALIZE the objective: per document, the T5-format
    * (input, target) pair — the input is the token stream with each
    * span replaced by its sentinel `<extra_id_N>`, the target is the
    * sentinel-prefixed concatenation of the corrupted spans (Raffel et
    * al. §3.1.4's example format, whitespace-token grain). Rendering
    * is deterministic on both engines: every fragment carries an
    * integer order key (token at position p → 2p; a span's sentinel →
    * 2·start−1 in the target and 2·start in the input, where it
    * REPLACES the span's tokens), one per-doc sort, one join of the
    * position stream against the span table (doc-keyed equi + range
    * filter — spans per doc are few). Docs with no spans emit their
    * tokens unchanged and an empty target; token-less docs emit two
    * empty strings (the no-silent-drop spine). */
  def materialize(docs: DataFrame, idCol: String, textCol: String,
                  corruptionRate: Double, spanLen: Int,
                  seed: String): DataFrame = {
    // both frames feed multiple subtrees below (sp: classified, the
    // target sentinels, the n_spans rollup; classified: both fragment
    // sets) — materialize each ONCE instead of re-running the
    // tokenize/window pipeline per consumer (review finding)
    val sp = spans(docs, idCol, textCol, corruptionRate, spanLen, seed)
      .localCheckpoint(true)
    val toks = docs
      .select(col(idCol), Ngrams.normTokens(col(textCol)).as("__toks"))
      .select(col(idCol), posexplode(col("__toks")).as(Seq("__pos", "__tok")))
    // both sides derive from `docs`: rename the span side's id before
    // joining (a toks(idCol) === sp(idCol) condition self-join-resolves
    // to the same attribute and degenerates to a per-doc cross join)
    val spR = sp.select(col(idCol).as("__sid"), col("span_idx"),
      col("start_pos"), col("end_pos"))
    val classified = toks.join(spR,
      col(idCol) === col("__sid") &&
        col("__pos") >= col("start_pos") && col("__pos") <= col("end_pos"),
      "left").drop("__sid")
      .localCheckpoint(true)
    val sentinel = concat(lit("<extra_id_"), col("span_idx"), lit(">"))
    val joined: Column =
      concat_ws(" ", transform(
        array_sort(collect_list(struct(col("__key"), col("__s")))),
        e => e("__s")))
    // a span contributes exactly ONE input fragment (its sentinel, at
    // the span start) — other in-span tokens are dropped, no distinct
    val inputFrags = classified
      .filter(col("span_idx").isNull || col("__pos") === col("start_pos"))
      .select(col(idCol),
        when(col("span_idx").isNull, col("__pos") * 2)
          .otherwise(col("start_pos") * 2).as("__key"),
        when(col("span_idx").isNull, col("__tok")).otherwise(sentinel)
          .as("__s"))
    val targetFrags = classified.filter(col("span_idx").isNotNull)
      .select(col(idCol), (col("__pos") * 2).as("__key"),
        col("__tok").as("__s"))
      .unionByName(sp.select(col(idCol),
        (col("start_pos") * 2 - 1).as("__key"),
        concat(lit("<extra_id_"), col("span_idx"), lit(">")).as("__s")))
    val inputs = inputFrags.groupBy(idCol).agg(joined.as("input_text"))
    val targets = targetFrags.groupBy(idCol).agg(joined.as("target_text"))
    docs.select(col(idCol))
      .join(inputs, Seq(idCol), "left")
      .join(targets, Seq(idCol), "left")
      .join(sp.groupBy(idCol).agg(count(lit(1)).as("n_spans")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("input_text"), lit("")).as("input_text"),
        coalesce(col("target_text"), lit("")).as("target_text"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
  }

  /** Per-doc corruption audit: token count, span count, corrupted
    * token count, realized rate (expected ≈ `corruptionRate`; the
    * release report's check that the objective builder is sampling at
    * spec). Docs with no tokens report (0, 0, 0, 0.0). */
  def audit(docs: DataFrame, idCol: String, textCol: String,
            corruptionRate: Double, spanLen: Int, seed: String): DataFrame = {
    val totals = docs
      .select(col(idCol),
        coalesce(size(Ngrams.normTokens(col(textCol))).cast("long"), lit(0L))
          .as("n_tokens"))
    val sp = spans(docs, idCol, textCol, corruptionRate, spanLen, seed)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_spans"), sum("span_len").as("n_corrupted"))
    totals.join(sp, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_corrupted"), lit(0L)).as("n_corrupted"),
        when(col("n_tokens") === 0, 0.0)
          .otherwise(coalesce(col("n_corrupted"), lit(0L)).cast("double") /
            col("n_tokens").cast("double")).as("realized_rate"))
  }
}
