package graft.operators

import org.apache.spark.sql.functions._

import graft.QueryUtils.QFn
import graft.sources.Tables

/** §2.N — round-3 modern-surface additions.
  *
  * `fn_variant` exercises Spark 4's VariantType (parse_json →
  * variant_get typed extraction, missing-path null semantics) — the
  * shredded semi-structured type that replaces string-JSON hot paths;
  * `llm_bpe_merges` is the first iteration of BPE tokenizer training
  * (adjacent character-pair frequencies over the token stream);
  * `llm_entity_cooccur` mines collocations (PMI over top-50-token
  * co-occurrence — candidate pairs bounded by a constant top-k, never
  * corpus²).
  */
object ModernSurfaceQueries {

  private def toks = filter(split(col("text"), " "), t => t =!= "")

  val queries: Map[String, QFn] = Map(

    // ---- VariantType: parse + typed extraction --------------------------
    // parse_json once into a variant, then typed gets: the Spark-4
    // path for semi-structured columns (binary shredded encoding, no
    // re-parse per extraction — the string-JSON fn_json row is the
    // baseline this supersedes at scale). Missing paths yield NULL
    // (variant_get's non-throwing contract).
    "fn_variant" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(col("event_id"),
          variant_get(col("v"), "$.k", "int").as("k"),
          variant_get(col("v"), "$.missing", "int").as("missing"),
          is_variant_null(col("v")).as("is_null"))
        .orderBy("event_id")
    }),

    // ---- BPE merge table, iteration 0 -----------------------------------
    // Adjacent character-pair frequencies over every token occurrence —
    // the statistic the first BPE merge is chosen from. Map-only
    // double explode (tokens, then the token's length−1 pairs), one
    // keyed count, distributed top-20. Single-char tokens are
    // pair-free and filtered before the position explode.
    "llm_bpe_merges" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(explode(toks).as("t"))
        .where(length(col("t")) >= 2)
        .select(explode(transform(
          sequence(lit(1), length(col("t")) - lit(1)),
          i => col("t").substr(i, lit(2)))).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair").asc)
        .limit(20)
    }),

    // ---- PMI collocations over the top-50 vocabulary --------------------
    // Pointwise mutual information of token co-occurrence within a
    // document, restricted to the corpus's top-50 tokens: candidate
    // pairs are ≤ C(50,2) per doc BY CONSTRUCTION (the vocabulary cap
    // is what makes co-occurrence mining tractable at 100 TB — the
    // unbounded version is corpus²). All counts integer; one ln at the
    // edge, rounded 4. Pairs seen in <5 docs are noise-filtered.
    "llm_entity_cooccur" -> ((s, dir) => {
      val docTok = Tables.documents(s, dir)
        .select(col("doc_id"), explode(toks).as("t")).distinct()
      val top50 = docTok.groupBy("t").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("t").asc).limit(50)
        .select(col("t"), col("df"))
      val dt = docTok.join(broadcast(top50), "t")
      val a = dt.select(col("doc_id"), col("t").as("ta"), col("df").as("dfa"))
      val b = dt.select(col("doc_id"), col("t").as("tb"), col("df").as("dfb"))
      val nDocs = Tables.documents(s, dir).agg(count(lit(1)).as("nd"))
      a.join(b, Seq("doc_id"))
        .where(col("ta") < col("tb"))
        .groupBy("ta", "tb")
        .agg(count(lit(1)).as("c_ab"),
          first(col("dfa")).as("c_a"), first(col("dfb")).as("c_b"))
        .where(col("c_ab") >= 5)
        .crossJoin(broadcast(nDocs))
        .select(col("ta"), col("tb"), col("c_ab"),
          round(log(col("c_ab").cast("double") * col("nd")
            / (col("c_a") * col("c_b"))), 4).as("pmi"))
        .orderBy(col("pmi").desc, col("ta").asc, col("tb").asc)
        .limit(20)
    })
  )

  val oracles: Map[String, String] = Map(

    "fn_variant" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS INTEGER) AS k,
        |  CAST(NULL AS INTEGER) AS missing,
        |  false AS is_null
        |FROM events ORDER BY event_id""".stripMargin,

    "llm_bpe_merges" ->
      """WITH t AS (SELECT unnest(list_filter(string_split(text, ' '),
        |    x -> x <> '')) AS t FROM documents),
        |p AS (SELECT substr(t, i, 2) AS pair
        |  FROM t, unnest(generate_series(1, length(t) - 1)) AS u(i)
        |  WHERE length(t) >= 2)
        |SELECT pair, CAST(count(*) AS BIGINT) AS n
        |FROM p GROUP BY pair
        |ORDER BY n DESC, pair ASC LIMIT 20""".stripMargin,

    "llm_entity_cooccur" ->
      """WITH dt0 AS (SELECT DISTINCT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
        |  FROM documents),
        |top50 AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM dt0
        |  GROUP BY t ORDER BY df DESC, t ASC LIMIT 50),
        |dt AS (SELECT doc_id, dt0.t, df FROM dt0 JOIN top50 ON dt0.t = top50.t),
        |nd AS (SELECT count(*) AS nd FROM documents),
        |pairs AS (SELECT a.ta, a.tb, CAST(count(*) AS BIGINT) AS c_ab,
        |    any_value(dfa) AS c_a, any_value(dfb) AS c_b
        |  FROM (SELECT x.doc_id, x.t AS ta, x.df AS dfa, y.t AS tb, y.df AS dfb
        |        FROM dt x JOIN dt y ON x.doc_id = y.doc_id AND x.t < y.t) a
        |  GROUP BY ta, tb HAVING count(*) >= 5)
        |SELECT ta, tb, c_ab,
        |  round(ln(CAST(c_ab AS DOUBLE) * nd / (c_a * c_b)), 4) AS pmi
        |FROM pairs, nd
        |ORDER BY pmi DESC, ta ASC, tb ASC LIMIT 20""".stripMargin
  )
}
