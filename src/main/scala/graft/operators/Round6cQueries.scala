package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.QueryUtils._
import graft.sources.Tables

/** §2.N (r6, third wave) — market-basket association rules, graph
  * degree assortativity, corpus stopword profiling, lexical-diversity
  * (TTR) audit, bigram conditional-entropy rate, and the explicit
  * shuffle-hash join strategy.
  *
  * Determinism (§7.2): supports/degrees/token masses are exact integer
  * counts; confidences/lifts/ratios are single double divisions of
  * integer products; log-bearing terms are rounded to 8dp then
  * decimal-summed; closed forms that chain through sqrt round to 6dp;
  * every ranking is total-ordered and every top-k cut is TakeOrdered.
  */
object Round6cQueries {

  private val duckToks = "list_filter(string_split(text, ' '), x -> x <> '')"

  val queries: Map[String, QFn] = Map(

    // ---- market-basket association rules --------------------------------
    // Classic association mining over order baskets (items = part
    // brands): for the top-20 brand pairs by lift, support counts,
    // confidence supp(ab)/supp(a) and lift N·supp(ab)/(supp(a)·supp(b)).
    // Pair expansion is keyed by the order (bounded by distinct brands
    // per basket², a small constant in any sane schema — the
    // graph-family bound); supports are item-keyed shuffles; the order
    // count is a 1-row broadcast. Integer counts end in single double
    // divisions, so no rounding is needed anywhere.
    "agg_market_basket" -> ((s, dir) => {
      // four consumers (order count, two support sides, pair expansion)
      // read this corpus-sized distinct — materialize it once (the
      // persisted-intermediate pattern; at scale this is a pipeline table)
      val items = Tables.lineitem(s, dir)
        .join(Tables.part(s, dir).select("p_partkey", "p_brand"),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("item"))
        .distinct()
        .transform(df => graft.tools.Materialize.eager("basket.items", df))
      val n = items.agg(countDistinct("ok").as("n_orders"))
      val supp = items.groupBy("item").agg(count(lit(1)).as("supp"))
      items.toDF("ok", "a")
        .join(items.toDF("ok2", "b"),
          col("ok") === col("ok2") && col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("supp_ab"))
        .join(supp.toDF("ia", "supp_a"), col("a") === col("ia"))
        .join(supp.toDF("ib", "supp_b"), col("b") === col("ib"))
        .crossJoin(broadcast(n))
        .select(col("a"), col("b"), col("supp_ab"), col("supp_a"),
          col("supp_b"), col("n_orders"),
          (col("supp_ab").cast(DoubleType) / col("supp_a").cast(DoubleType))
            .as("conf_a_to_b"),
          ((col("n_orders") * col("supp_ab")).cast(DoubleType) /
            (col("supp_a") * col("supp_b")).cast(DoubleType)).as("lift"))
        .orderBy(col("lift").desc, col("a"), col("b"))
        .limit(20)
    }),

    // ---- degree assortativity -------------------------------------------
    // Newman's degree assortativity of the March-1997 supplier
    // co-occurrence graph: the Pearson correlation of endpoint degrees
    // over the symmetrized edge list (do hubs link to hubs?). Degrees
    // are integer counts, every moment an exact integer sum; the one
    // sqrt-bearing closed form rounds to 6dp.
    "graph_assortativity" -> ((s, dir) => {
      val e = GraphStatsQueries.supplierEdges(s, dir)
      val deg = e.select(col("sa").as("v"))
        .union(e.select(col("sb").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
      val de = e
        .join(deg.toDF("va", "da"), col("sa") === col("va"))
        .join(deg.toDF("vb", "db"), col("sb") === col("vb"))
      val sym = de.select(col("da").as("x"), col("db").as("y"))
        .union(de.select(col("db").as("x"), col("da").as("y")))
      def d(c: String) = col(c).cast(DoubleType)
      sym.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(expr("n div 2").as("n_edges"),
          round((d("n") * d("sxy") - d("sx") * d("sy")) /
            sqrt((d("n") * d("sxx") - d("sx") * d("sx")) *
              (d("n") * d("syy") - d("sy") * d("sy"))), 6)
            .as("assortativity"))
    }),

    // ---- stopword mass profile ------------------------------------------
    // Per-source stopword mass ratio, with the stopword list DERIVED
    // from the corpus itself (the 20 most frequent tokens — the
    // standard bootstrap when no curated list exists for a language
    // mix). The top-20 rank rides GlobalRank and broadcasts 20 rows;
    // the probe is a map-side broadcast left join; ratios are
    // integer/integer single divisions.
    "llm_stopword_profile" -> ((s, dir) => {
      // both the stop-list cut and the per-source stop shares roll up
      // from the shared unigram ledger (r10 verdict item 6): the old
      // second corpus pass (token stream × top-20 join) becomes a
      // vocab-scale ledger join — counts are exact, results identical
      val st = graft.tools.TokenArtifacts.bySource(s, dir)
      val cnts = st.groupBy("tok").agg(sum("cnt").as("cnt"))
      val top20 = GlobalRank
        .withSeq(cnts, "rn", Seq(col("cnt").desc, col("tok").asc))
        .where(col("rn") <= 20).select(col("tok").as("sw"))
      st.join(broadcast(top20), col("tok") === col("sw"), "left")
        .groupBy("source")
        .agg(sum("cnt").as("n_tokens"),
          sum(when(col("sw").isNotNull, col("cnt")).otherwise(lit(0L)))
            .as("stop_tokens"))
        .select(col("source"), col("n_tokens"), col("stop_tokens"),
          (col("stop_tokens").cast(DoubleType) /
            col("n_tokens").cast(DoubleType)).as("stop_ratio"))
        .orderBy("source")
    }),

    // ---- type-token ratio (lexical diversity) ---------------------------
    // Per-language lexical diversity: mean per-doc type-token ratio
    // (8dp-rounded then decimal-summed — the only order-risky float)
    // and the corpus-level TTR lang_vocab/total_tokens. Per-doc
    // distincts are map-side array ops; the vocab count is one
    // token-keyed distinct per lang.
    "llm_ttr_by_lang" -> ((s, dir) => {
      val toks = filter(split(col("text"), " "), t => t =!= "")
      val perDoc = Tables.documents(s, dir)
        .select(col("lang"), nTok.as("nt"),
          size(array_distinct(toks)).cast("long").as("nd"))
        // zero-token docs would put 0/0 in the per-doc TTR — NULL on
        // Spark (null-skipped by sum) vs NaN on DuckDB; exclude them
        // on BOTH sides so cross-engine parity cannot hinge on the
        // fixture never containing an empty document
        .where(col("nt") >= 1)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("total_tokens"),
          sum(round(col("nd").cast(DoubleType) / col("nt").cast(DoubleType), 8)
            .cast(DecimalType(18, 8))).as("ttr_sum"))
      val vocab = Tables.documents(s, dir)
        .select(col("lang"), explode(toks).as("tok"))
        .groupBy("lang").agg(countDistinct("tok").as("lang_vocab"))
      perDoc.join(vocab, "lang")
        .select(col("lang"), col("n_docs"), col("total_tokens"),
          col("lang_vocab"),
          (col("ttr_sum").cast(DoubleType) / col("n_docs")).as("mean_doc_ttr"),
          (col("lang_vocab").cast(DoubleType) /
            col("total_tokens").cast(DoubleType)).as("corpus_ttr"))
        .orderBy("lang")
    }),

    // ---- bigram conditional entropy rate --------------------------------
    // Sequence predictability per language: H(W₂|W₁) =
    // −Σ p(w₁,w₂)·ln p(w₂|w₁) over the bigram table — the complement
    // of llm_doc_entropy's unigram view (high = diverse continuations,
    // low = templated text). Bigrams are map-side; counts are
    // (lang, w1, w2)-keyed shuffles bounded by the bigram vocabulary;
    // per-lang totals broadcast; terms 8dp-rounded then decimal-summed.
    "llm_bigram_entropy_rate" -> ((s, dir) => {
      // family convention: drop empty tokens (consecutive spaces must
      // not mint empty-string bigram states; keeps the unigram and
      // bigram views on the same token stream). r14: adjacent pairs via
      // the codegen'd SkipGramList(1) kernel (the transform(sequence())
      // form interpreted its lambda per element); identical pairs.
      val bg = Tables.documents(s, dir)
        .select(col("lang"), explode_outer(
          graft.functions.TextNGrams.mkSkipGrams(col("text"), 1)).as("b"))
        .where(col("b").isNotNull)
        .select(col("lang"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val c12 = bg.groupBy("lang", "w1", "w2").agg(count(lit(1)).as("c12"))
      val c1 = c12.groupBy("lang", "w1").agg(sum("c12").as("c1"))
      val tot = c12.groupBy("lang")
        .agg(sum("c12").as("t"), count(lit(1)).as("n_bigram_types"))
      c12.join(c1, Seq("lang", "w1")).join(broadcast(tot), "lang")
        .select(col("lang"), col("t"), col("n_bigram_types"),
          round(-(col("c12").cast(DoubleType) / col("t").cast(DoubleType)) *
            log(col("c12").cast(DoubleType) / col("c1").cast(DoubleType)), 8)
            .cast(DecimalType(18, 8)).as("term"))
        .groupBy("lang")
        .agg(max("t").as("n_bigrams"),
          max("n_bigram_types").as("n_bigram_types"),
          sum("term").cast(DoubleType).as("entropy_rate"))
        .orderBy("lang")
    }),

    // ---- explicit shuffle-hash join -------------------------------------
    // The third join strategy made explicit: lineitem ⋈ orders with a
    // SHUFFLE_HASH hint on the smaller build side — the strategy of
    // choice when both sides are too big to broadcast but the build
    // side fits per-partition memory (skips the SMJ sort entirely).
    // Round6cSpec plan-asserts the ShuffledHashJoin node survives AQE.
    "join_shuffle_hash" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
            .select("o_orderkey", "o_orderpriority").hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          decSum(col("l_extendedprice")).as("revenue"))
        .orderBy("o_orderpriority")
    })
  )

  val oracles: Map[String, String] = Map(

    "agg_market_basket" -> """
      |WITH it AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS item
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM it),
      |s AS (SELECT item, CAST(count(*) AS BIGINT) AS supp FROM it GROUP BY item),
      |p AS (SELECT i1.item AS a, i2.item AS b, CAST(count(*) AS BIGINT) AS supp_ab
      |  FROM it i1 JOIN it i2 ON i1.ok = i2.ok AND i1.item < i2.item
      |  GROUP BY i1.item, i2.item)
      |SELECT p.a, p.b, p.supp_ab, sa.supp AS supp_a, sb.supp AS supp_b,
      |  n.n_orders,
      |  CAST(p.supp_ab AS DOUBLE) / CAST(sa.supp AS DOUBLE) AS conf_a_to_b,
      |  CAST(n.n_orders * p.supp_ab AS DOUBLE)
      |    / CAST(sa.supp * sb.supp AS DOUBLE) AS lift
      |FROM p JOIN s sa ON p.a = sa.item JOIN s sb ON p.b = sb.item CROSS JOIN n
      |ORDER BY lift DESC, a, b LIMIT 20""".stripMargin,

    "graph_assortativity" -> s"""
      |WITH ${GraphStatsQueries.edgesSql},
      |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM
      |  (SELECT sa AS v FROM e UNION ALL SELECT sb AS v FROM e) GROUP BY v),
      |de AS (SELECT da.deg AS x, db.deg AS y FROM e
      |  JOIN deg da ON e.sa = da.v JOIN deg db ON e.sb = db.v),
      |sym AS (SELECT x, y FROM de UNION ALL SELECT y AS x, x AS y FROM de),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy FROM sym)
      |SELECT n // 2 AS n_edges,
      |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
      |    AS assortativity
      |FROM m""".stripMargin,

    "llm_stopword_profile" -> s"""
      |WITH t AS (SELECT source, unnest($duckToks) AS tok FROM documents),
      |c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
      |sw AS (SELECT tok AS sw FROM
      |  (SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) AS rn FROM c)
      |  WHERE rn <= 20),
      |t2 AS (SELECT t.source, sw.sw FROM t LEFT JOIN sw ON t.tok = sw.sw)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(count(*) FILTER (sw IS NOT NULL) AS BIGINT) AS stop_tokens,
      |  CAST(count(*) FILTER (sw IS NOT NULL) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS stop_ratio
      |FROM t2 GROUP BY source ORDER BY source""".stripMargin,

    "llm_ttr_by_lang" -> s"""
      |WITH d AS (SELECT lang, CAST(len($duckToks) AS BIGINT) AS nt,
      |    CAST(len(list_distinct($duckToks)) AS BIGINT) AS nd
      |  FROM documents),
      |pd AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(nt) AS BIGINT) AS total_tokens,
      |    sum(CAST(round(CAST(nd AS DOUBLE) / CAST(nt AS DOUBLE), 8)
      |      AS DECIMAL(18,8))) AS ttr_sum
      |  FROM d WHERE nt >= 1 GROUP BY lang),
      |v AS (SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS lang_vocab
      |  FROM (SELECT lang, unnest($duckToks) AS tok FROM documents)
      |  GROUP BY lang)
      |SELECT pd.lang, pd.n_docs, pd.total_tokens, v.lang_vocab,
      |  CAST(ttr_sum AS DOUBLE) / n_docs AS mean_doc_ttr,
      |  CAST(lang_vocab AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS corpus_ttr
      |FROM pd JOIN v ON pd.lang = v.lang ORDER BY pd.lang""".stripMargin,

    "llm_bigram_entropy_rate" -> s"""
      |WITH bg AS (SELECT lang, tok[i] AS w1, tok[i + 1] AS w2
      |  FROM (SELECT lang, $duckToks AS tok FROM documents),
      |    unnest(generate_series(1, len(tok) - 1)) u(i)
      |  WHERE len(tok) >= 2),
      |c12 AS (SELECT lang, w1, w2, CAST(count(*) AS BIGINT) AS c12
      |  FROM bg GROUP BY lang, w1, w2),
      |c1 AS (SELECT lang, w1, CAST(sum(c12) AS BIGINT) AS c1
      |  FROM c12 GROUP BY lang, w1),
      |tot AS (SELECT lang, CAST(sum(c12) AS BIGINT) AS t,
      |    CAST(count(*) AS BIGINT) AS n_bigram_types
      |  FROM c12 GROUP BY lang),
      |terms AS (SELECT c12.lang, tot.t, tot.n_bigram_types,
      |    CAST(round(-(CAST(c12 AS DOUBLE) / CAST(t AS DOUBLE))
      |      * ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)), 8)
      |      AS DECIMAL(18,8)) AS term
      |  FROM c12 JOIN c1 ON c12.lang = c1.lang AND c12.w1 = c1.w1
      |  JOIN tot ON c12.lang = tot.lang)
      |SELECT lang, max(t) AS n_bigrams, max(n_bigram_types) AS n_bigram_types,
      |  CAST(sum(term) AS DOUBLE) AS entropy_rate
      |FROM terms GROUP BY lang ORDER BY lang""".stripMargin,

    "join_shuffle_hash" -> """
      |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  )
}
