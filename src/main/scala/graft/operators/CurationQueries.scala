package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryUtils._
import graft.sources.Tables

/** §2.N (continued) — corpus-curation operators a training-data pipeline
  * runs between raw ingest and dedup: benchmark decontamination,
  * repetition-based quality signals (the Gopher/C4 rules), text
  * normalization, and canonical-document selection per duplicate group.
  *
  * Scale notes (100 TB):
  *  - decontamination is a gram-keyed equi-join: the corpus side
  *    explodes to (gram, doc) pairs and shuffles by gram; the benchmark
  *    side is a FIXED-SIZE gram set (benchmarks don't grow with the
  *    corpus), so AQE broadcasts it and the corpus pass is map-side —
  *    the canonical production shape. No full-corpus structure is ever
  *    collected or broadcast.
  *  - repetition metrics are one explode + one two-level aggregation
  *    keyed by doc — embarrassingly parallel, partial-agg friendly.
  *  - normalization is map-only (regex chains fused into one
  *    whole-stage-codegen projection over the scan).
  *  - canonical selection is exact dedup's hash-groupBy with a max_by
  *    tiebreak — one shuffle keyed by content hash.
  */
object CurationQueries {

  val queries: Map[String, QFn] = Map(

    // ---- benchmark decontamination (13-token-gram overlap) -------------
    // The held-out "benchmark" set is the deterministic doc_id % 97 == 0
    // slice; a training doc is contaminated if it shares any 13-token
    // window with any benchmark doc. 13 contiguous tokens is the
    // published decontamination granularity (GPT-3 appendix C / PaLM);
    // the check is exact n-gram membership, not fuzzy.
    "llm_decontaminate" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"),
          filter(split(col("text"), " "), t => t =!= "").as("tok"))
      val grams = toks
        .where(size(col("tok")) >= 13)
        .select(col("doc_id"), explode(
          transform(sequence(lit(0), size(col("tok")) - 13),
            i => concat_ws(" ", slice(col("tok"), i + 1, lit(13))))).as("g"))
        .distinct()
      val benchGrams = grams.where(col("doc_id") % 97 === 0)
        .select(col("g")).distinct()
      grams.where(col("doc_id") % 97 =!= 0)
        .join(benchGrams, "g")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_hits"))
        .orderBy("doc_id")
    }),

    // ---- repetition quality signals (Gopher-style) ---------------------
    // Per doc: token count, distinct-token ratio, most-frequent-token
    // fraction, duplicate-bigram fraction. All ratios rounded to 4
    // decimals (repo determinism convention).
    "llm_quality_repetition" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"),
          filter(split(col("text"), " "), t => t =!= "").as("tok"))
        .where(size(col("tok")) >= 2)
        .select(col("doc_id"), col("tok"),
          transform(sequence(lit(0), size(col("tok")) - 2),
            i => concat_ws(" ", slice(col("tok"), i + 1, lit(2)))).as("big"))
      val perTok = toks
        .select(col("doc_id"), size(col("tok")).as("n_tok"),
          size(col("big")).as("n_big"),
          size(array_distinct(col("big"))).as("d_big"),
          explode(col("tok")).as("t"))
        .groupBy("doc_id", "n_tok", "n_big", "d_big", "t")
        .agg(count(lit(1)).as("c"))
      perTok.groupBy("doc_id", "n_tok", "n_big", "d_big")
        .agg(max(col("c")).as("top_c"), count(lit(1)).as("n_distinct"))
        .select(col("doc_id"), col("n_tok").cast("long").as("n_tok"),
          round(col("n_distinct").cast("double") / col("n_tok"), 4)
            .as("distinct_ratio"),
          round(col("top_c").cast("double") / col("n_tok"), 4)
            .as("top_token_frac"),
          round(lit(1.0) - col("d_big").cast("double") / col("n_big"), 4)
            .as("dup_bigram_frac"))
        .orderBy("doc_id")
    }),

    // ---- text normalization (map-only) ---------------------------------
    // lower → strip non-[a-z0-9 ] → collapse runs of spaces → trim; the
    // whole chain fuses into one codegen'd projection over the scan.
    "llm_normalize" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          trim(regexp_replace(
            regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
            " +", " ")).as("norm_text"))
        .withColumn("n_tokens",
          when(col("norm_text") === "", lit(0))
            .otherwise(size(split(col("norm_text"), " "))).cast("long"))
        .orderBy("doc_id")
    }),

    // ---- canonical-document selection per exact-dup group --------------
    // Exact dedup keyed by md5(text), keeping ONE canonical row per
    // group: the longest document, ties broken by smallest doc_id —
    // max_by over a (n_chars, -doc_id) tuple, one shuffle, no window.
    "llm_dedup_canonical" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy(md5(col("text")).as("text_md5"))
        .agg(
          max_by(col("doc_id"),
            struct(col("n_chars"), -col("doc_id"))).as("keep_id"),
          count(lit(1)).as("n_copies"),
          max("n_chars").as("max_chars"))
        .orderBy("text_md5")
    }))

  val oracles: Map[String, String] = Map(
    "llm_decontaminate" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') tok
        |          FROM documents),
        |g AS (SELECT DISTINCT doc_id, unnest(list_transform(
        |        generate_series(1, len(tok) - 12),
        |        i -> array_to_string(tok[i:i+12], ' '))) AS g
        |      FROM t WHERE len(tok) >= 13),
        |b AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0)
        |SELECT doc_id, count(*) AS n_hits
        |FROM g JOIN b USING (g)
        |WHERE doc_id % 97 <> 0
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "llm_quality_repetition" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') tok
        |          FROM documents),
        |tb AS (SELECT doc_id, tok, list_transform(generate_series(1, len(tok) - 1),
        |         i -> tok[i] || ' ' || tok[i+1]) big
        |       FROM t WHERE len(tok) >= 2),
        |e AS (SELECT doc_id, len(tok) n_tok, len(big) n_big,
        |        len(list_distinct(big)) d_big, unnest(tok) AS tk
        |      FROM tb),
        |c AS (SELECT doc_id, n_tok, n_big, d_big, tk, count(*) c
        |      FROM e GROUP BY doc_id, n_tok, n_big, d_big, tk)
        |SELECT doc_id, n_tok,
        |  round(count(*) * 1.0 / n_tok, 4) AS distinct_ratio,
        |  round(max(c) * 1.0 / n_tok, 4) AS top_token_frac,
        |  round(1.0 - d_big * 1.0 / n_big, 4) AS dup_bigram_frac
        |FROM c GROUP BY doc_id, n_tok, n_big, d_big
        |ORDER BY doc_id""".stripMargin,

    "llm_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |                      ' +', ' ', 'g')) AS norm_text,
        |  CASE WHEN trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |                      ' +', ' ', 'g')) = '' THEN 0
        |       ELSE len(string_split(trim(regexp_replace(regexp_replace(lower(text),
        |                      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' '))
        |  END AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "llm_dedup_canonical" ->
      """WITH r AS (SELECT md5(text) AS text_md5, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY md5(text)
        |                       ORDER BY n_chars DESC, doc_id ASC) AS rk,
        |    count(*) OVER (PARTITION BY md5(text)) AS n_copies,
        |    max(n_chars) OVER (PARTITION BY md5(text)) AS max_chars
        |  FROM documents)
        |SELECT text_md5, doc_id AS keep_id, n_copies, max_chars
        |FROM r WHERE rk = 1 ORDER BY text_md5""".stripMargin)
}
