package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators over `documents` — the training-data-pipeline
 * surface (language ID, quality scoring, token counting, fingerprinting,
 * exact dedup), plus the reference's text transforms: RegexpMatcher
 * (/root/reference/processors/regexp_matcher.go:14-42) as `rlike` filters and
 * CSVTransformer (/root/reference/processors/csv_transformer.go:17-66) as a
 * deterministic schema-ordered `concat_ws` (the reference's header order is
 * map-iteration nondeterministic; ours never is).
 *
 * All expressions are pure Catalyst functions (codegen'd) with exact DuckDB
 * mirrors: integer counting + identical IEEE arithmetic + round(…, 4).
 */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** whitespace-ish word tokens, lowercased */
  private val toks = regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))
  private val nToks = size(toks)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // RegexpMatcher: forward only payloads matching the pattern.
    "q_regexp_filter" -> ((s, dir) => {
      docs(s, dir).filter(col("text").rlike("\\b(merge|join)\\b"))
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // FuncTransformer analogue: pure projection/expression transform.
    "q_transform" -> ((s, dir) => {
      docs(s, dir).select(
        col("doc_id"),
        upper(col("lang")).as("lang_uc"),
        length(col("text")).as("text_len"),
        (col("n_chars") * 2).as("n2"))
    }),

    // CSVTransformer: row -> csv line, deterministic column order.
    "q_csv_format" -> ((s, dir) => {
      docs(s, dir).select(
        col("doc_id"),
        concat_ws(",", col("doc_id").cast("string"), col("lang"),
          col("source"), col("n_chars").cast("string")).as("line"))
    }),

    // Token counting (whitespace/letter-run tokenizer).
    "q_token_count" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"), nToks.as("n_tokens"))
    }),

    // BPE-ish token estimate: the GPT-2 pre-tokenizer split (contraction
    // suffixes | space-prefixed letter runs | digit runs | punctuation runs |
    // whitespace), minus the trailing-space lookahead — RE2-safe so the
    // DuckDB oracle evaluates the IDENTICAL pattern. Counts pre-tokens, the
    // standard cheap proxy for LLM token budgets at corpus scale.
    "q_token_bpe" -> ((s, dir) => {
      val bpe = "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
      docs(s, dir).select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(bpe), lit(0))).as("n_bpe"))
    }),

    // Language ID: stopword-hit-ratio heuristic (n-gram-free, deterministic).
    "q_lang_id" -> ((s, dir) => {
      val hits = size(regexp_extract_all(lower(col("text")),
        lit("\\b(the|a|of|to|in|and)\\b"), lit(0)))
      docs(s, dir).select(
        col("doc_id"),
        col("lang"),
        when(hits * lit(1.0) / greatest(nToks, lit(1)) >= 0.05, "en")
          .otherwise("other").as("pred_lang"))
    }),

    // Quality scoring: length + word-shape composite in [0, 1].
    "q_quality_score" -> ((s, dir) => {
      val words = nToks
      val chars = length(col("text"))
      val avgWlen = chars * lit(1.0) / greatest(words, lit(1))
      val score = least(words / lit(50.0), lit(1.0)) * 0.5 +
        least(avgWlen / lit(8.0), lit(1.0)) * 0.5
      docs(s, dir).select(
        col("doc_id"),
        words.as("n_words"),
        round(avgWlen, 4).as("avg_word_len"),
        round(score, 4).as("quality"))
    }),

    // Document fingerprint: whitespace-normalized content hash.
    "q_fingerprint" -> ((s, dir) => {
      docs(s, dir).select(
        col("doc_id"),
        md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))
    }),

    // Exact dedup: hash-groupBy on the fingerprint; keeper = min doc_id.
    "q_dedup_exact" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"), md5(lower(col("text"))).as("fp"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    }),

    // Opaque-binary plumbing: treat text bytes as a binary payload column
    // (multimodal pattern: binary + typed metadata).
    "q_binary_stats" -> ((s, dir) => {
      docs(s, dir).select(
        col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        md5(col("text")).as("checksum"))
    }))

  val oracles: Map[String, String] = Map(
    "q_regexp_filter" ->
      """SELECT doc_id, lang, source FROM documents
         WHERE regexp_matches(text, '\b(merge|join)\b')""",
    "q_transform" ->
      """SELECT doc_id, upper(lang) AS lang_uc, length(text) AS text_len,
         n_chars * 2 AS n2 FROM documents""",
    "q_csv_format" ->
      """SELECT doc_id, concat_ws(',', CAST(doc_id AS VARCHAR), lang, source,
         CAST(n_chars AS VARCHAR)) AS line FROM documents""",
    "q_token_count" ->
      """SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z]+')) AS n_tokens
         FROM documents""",
    "q_token_bpe" ->
      """SELECT doc_id, len(regexp_extract_all(text,
           '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')) AS n_bpe
         FROM documents""",
    "q_lang_id" ->
      """SELECT doc_id, lang,
         CASE WHEN len(regexp_extract_all(lower(text), '\b(the|a|of|to|in|and)\b')) * 1.0
                   / greatest(len(regexp_extract_all(lower(text), '[a-z]+')), 1) >= 0.05
              THEN 'en' ELSE 'other' END AS pred_lang
         FROM documents""",
    "q_quality_score" ->
      """SELECT doc_id,
         len(regexp_extract_all(lower(text), '[a-z]+')) AS n_words,
         round(length(text) * 1.0 / greatest(len(regexp_extract_all(lower(text), '[a-z]+')), 1), 4) AS avg_word_len,
         round(least(len(regexp_extract_all(lower(text), '[a-z]+')) / 50.0, 1.0) * 0.5
             + least(length(text) * 1.0 / greatest(len(regexp_extract_all(lower(text), '[a-z]+')), 1) / 8.0, 1.0) * 0.5, 4) AS quality
         FROM documents""",
    "q_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
         FROM documents""",
    "q_dedup_exact" ->
      """SELECT fp, min(doc_id) AS keep_id, count(*) AS n_copies FROM (
           SELECT doc_id, md5(lower(text)) AS fp FROM documents)
         GROUP BY fp""",
    "q_binary_stats" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
         md5(text) AS checksum FROM documents""")
}
