package graft.queries

import graft.ext.{ExactDedup, Multimodal, TextAnalysis => TA}
import graft.util.Tables._
import org.apache.spark.sql.functions._

/** North-star training-data-pipeline operators (BASELINE.json
  * `north_star`): deduplication, text analysis, multimodal plumbing,
  * similarity search — each designed shuffle-light for 100 TB and
  * oracle-checked on the `documents`/`embeddings` tables where
  * SQL-expressible.
  */
object ExtQueries {

  /** Exact dedup: hash-groupBy on the md5 fingerprint of normalized text,
    * min-id canonical. */
  private val x01 = Q("x01_dedup_exact",
    (s, d) => ExactDedup.dedup(documents(s, d), "doc_id", "text")
      .orderBy("canonical_id"),
    Some("""SELECT min(doc_id) AS canonical_id, CAST(count(*) AS BIGINT) AS dup_count, fp
            FROM (SELECT doc_id,
                    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
                  FROM documents)
            GROUP BY fp ORDER BY canonical_id"""))

  /** Language-ID: per-language stopword hit ratios + non-ASCII charset
    * signal, argmax with alphabetical tie-break. */
  private val x02 = Q("x02_langid",
    (s, d) => {
      val t = col("text")
      val scored = documents(s, d).select(col("doc_id"),
        TA.stopwordRatio(t, TA.stopDe).as("s_de"),
        TA.stopwordRatio(t, TA.stopEn).as("s_en"),
        TA.stopwordRatio(t, TA.stopEs).as("s_es"),
        TA.stopwordRatio(t, TA.stopFr).as("s_fr"),
        TA.nonAsciiRatio(t).as("s_zh"))
      val g = greatest(col("s_de"), col("s_en"), col("s_es"), col("s_fr"), col("s_zh"))
      scored.withColumn("predicted",
        when(col("s_de") >= g, "de").when(col("s_en") >= g, "en")
          .when(col("s_es") >= g, "es").when(col("s_fr") >= g, "fr")
          .otherwise("zh"))
        .orderBy("doc_id")
    },
    Some(s"""WITH t AS (SELECT doc_id, text,
                 regexp_extract_all(lower(text), '[a-z]+') AS toks FROM documents),
             sc AS (SELECT doc_id,
               ${langScoreSql("s_de", "'der','die','das','und','ist','nicht','mit','ein','zu','den'")},
               ${langScoreSql("s_en", "'the','a','of','and','to','in','is','it','for','on'")},
               ${langScoreSql("s_es", "'el','la','que','y','en','un','es','los','se','del'")},
               ${langScoreSql("s_fr", "'le','la','et','un','que','pour','dans','ce','une','sur'")},
               CASE WHEN length(text) = 0 THEN 0.0
                    ELSE CAST(length(text) - length(regexp_replace(text, '[ -~]', '', 'g')) AS DOUBLE) / length(text)
               END AS s_zh
             FROM t)
             SELECT doc_id, s_de, s_en, s_es, s_fr, s_zh,
               CASE WHEN s_de >= greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
                    WHEN s_en >= greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
                    WHEN s_es >= greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
                    WHEN s_fr >= greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
                    ELSE 'zh' END AS predicted
             FROM sc ORDER BY doc_id"""))

  private def langScoreSql(alias: String, words: String): String =
    s"""CASE WHEN len(toks) = 0 THEN 0.0
             ELSE CAST(len(list_filter(toks, x -> x IN ($words))) AS DOUBLE) / len(toks)
        END AS $alias"""

  /** Quality scoring: length/token/digit/stopword features combined into
    * a deterministic score. */
  private val x03 = Q("x03_quality_score",
    (s, d) => {
      val t = col("text")
      documents(s, d).select(col("doc_id"),
          length(t).cast("long").as("n_chars_calc"),
          size(TA.wsTokens(t)).cast("long").as("n_tokens"),
          TA.digitRatio(t).as("digit_ratio"),
          TA.stopwordRatio(t, TA.stopEn).as("stop_ratio"))
        .withColumn("avg_token_len",
          when(col("n_tokens") === 0, 0.0)
            .otherwise((col("n_chars_calc") - col("n_tokens") + 1).cast("double") / col("n_tokens")))
        .withColumn("score",
          lit(0.4) * col("stop_ratio")
            + lit(0.3) * (least(col("avg_token_len"), lit(10.0)) / 10.0)
            + lit(0.3) * (lit(1.0) - col("digit_ratio")))
        .orderBy("doc_id")
    },
    Some("""WITH f AS (SELECT doc_id,
              CAST(length(text) AS BIGINT) AS n_chars_calc,
              CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
              CASE WHEN length(text) = 0 THEN 0.0
                   ELSE CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text) END AS digit_ratio,
              CASE WHEN len(regexp_extract_all(lower(text), '[a-z]+')) = 0 THEN 0.0
                   ELSE CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
                          x -> x IN ('the','a','of','and','to','in','is','it','for','on'))) AS DOUBLE)
                        / len(regexp_extract_all(lower(text), '[a-z]+')) END AS stop_ratio
            FROM documents),
            g AS (SELECT *, CASE WHEN n_tokens = 0 THEN 0.0
                   ELSE CAST(n_chars_calc - n_tokens + 1 AS DOUBLE) / n_tokens END AS avg_token_len
            FROM f)
            SELECT doc_id, n_chars_calc, n_tokens, digit_ratio, stop_ratio, avg_token_len,
                   0.4 * stop_ratio + 0.3 * (least(avg_token_len, 10.0) / 10.0)
                     + 0.3 * (1.0 - digit_ratio) AS score
            FROM g ORDER BY doc_id"""))

  /** Token counting: whitespace tokens + BPE-ish regex pre-tokens. */
  private val x04 = Q("x04_token_stats",
    (s, d) => documents(s, d).select(col("doc_id"),
        size(TA.wsTokens(col("text"))).cast("long").as("n_ws_tokens"),
        size(TA.bpeIshTokens(col("text"))).cast("long").as("n_bpe_tokens"),
        length(col("text")).cast("long").as("n_chars_calc"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws_tokens,
                   CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars_calc
            FROM documents ORDER BY doc_id"""))

  /** Document fingerprinting: md5 + 64-bit (sha256 prefix) content
    * fingerprints of normalized text. */
  private val x05 = Q("x05_fingerprint",
    (s, d) => documents(s, d).select(col("doc_id"),
        TA.fingerprintMd5(col("text")).as("fp_md5"),
        TA.fingerprint64(col("text")).as("fp64"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_md5,
                   substr(sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 16) AS fp64
            FROM documents ORDER BY doc_id"""))

  /** Multimodal metadata: opaque binary payload column + deterministic
    * metadata extraction (the decode itself is a stub — see
    * [[graft.ext.Multimodal]]). */
  private val x06 = Q("x06_multimodal_meta",
    (s, d) => Multimodal.metaColumns(
        documents(s, d).withColumn("payload", col("text").cast("binary")),
        "doc_id", "payload")
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   sha256(text) AS sha256,
                   CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
                   CAST((octet_length(encode(text)) * 7) % 480 + 1 AS INT) AS height,
                   CAST(octet_length(encode(text)) % 16 + 1 AS INT) AS n_frames
            FROM documents ORDER BY doc_id"""))

  val qs: Seq[Q] = Seq(x01, x02, x03, x04, x05, x06)
}
