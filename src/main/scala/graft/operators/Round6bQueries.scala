package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.QueryUtils._
import graft.sources.Tables

/** §2.N (r6, second wave) — corpus drift and tokenizer-design metrics
  * (cross-entropy/KL between corpus halves, vocabulary coverage@k,
  * token fertility), causal-inference experiment analytics
  * (difference-in-differences, CUPED variance reduction), link
  * prediction on the supplier co-occurrence graph (common-neighbor
  * Jaccard), and source-diversified top-k selection.
  *
  * Determinism (§7.2): probabilities and means are integer/decimal
  * ratios with fixed-order double ops; every log-bearing term is
  * rounded to 8dp then decimal-summed (order-free across shuffles);
  * corpus-wide and per-source rankings ride GlobalRank, never an
  * unpartitioned window; all top-k cuts end in a total order.
  */
object Round6bQueries {

  private val duckToks = "list_filter(string_split(text, ' '), x -> x <> '')"

  /** Post-period cutover for the experiment analytics: events span
    * 2024-01-01 → 2024-01-30, so Jan 16 splits the log roughly in half. */
  private val cutLit = "2024-01-16 00:00:00"

  val queries: Map[String, QFn] = Map(

    // ---- corpus cross-entropy / KL drift --------------------------------
    // Distribution-shift audit between two corpus halves (doc_id
    // parity stands in for "yesterday's crawl vs today's"): per lang,
    // the cross-entropy H(A, B) = −Σ p_A·ln p_B and KL(A‖B) =
    // Σ p_A·ln(p_A/p_B) of add-1-smoothed unigram distributions over
    // the joint vocabulary. The canonical "did the token mix move"
    // gate before mixing a new crawl into training data. Token-keyed
    // shuffle (scales with vocabulary, not docs²); per-lang totals are
    // a 5-row broadcast; each term is rounded to 8dp and
    // decimal-summed so the cross-shuffle sum is order-free.
    "llm_cross_entropy" -> ((s, dir) => {
      // the ledger's `half` key (doc_id % 2) exists exactly for this
      // split-half contrast — both halves' counts roll up from the
      // shared unigram ledger (r10 verdict item 6)
      val tf = graft.tools.TokenArtifacts.unigram(s, dir)
        .groupBy("lang", "tok")
        .agg(sum(when(col("half") === 0, col("cnt")).otherwise(lit(0L)))
            .as("ca"),
          sum(when(col("half") === 1, col("cnt")).otherwise(lit(0L)))
            .as("cb"))
      val tot = tf.groupBy("lang")
        .agg(sum("ca").as("na"), sum("cb").as("nb"), count(lit(1)).as("v"))
      val pa = (col("ca") + 1).cast(DoubleType) /
        (col("na") + col("v")).cast(DoubleType)
      val pb = (col("cb") + 1).cast(DoubleType) /
        (col("nb") + col("v")).cast(DoubleType)
      tf.join(broadcast(tot), "lang")
        .select(col("lang"),
          round(-(pa * log(pb)), 8).cast(DecimalType(18, 8)).as("ce_term"),
          round(pa * log(pa / pb), 8).cast(DecimalType(18, 8)).as("kl_term"),
          col("na"), col("nb"), col("v"))
        .groupBy("lang")
        .agg(max("v").as("vocab"), max("na").as("n_a"), max("nb").as("n_b"),
          sum("ce_term").cast(DoubleType).as("cross_entropy"),
          sum("kl_term").cast(DoubleType).as("kl_div"))
        .orderBy("lang")
    }),

    // ---- vocabulary coverage@k ------------------------------------------
    // Tokenizer-design curve: what fraction of the corpus token mass
    // the top-k vocabulary covers (k = 100 / 1k / 10k) — the standard
    // vocab-size selection metric. Counts are one token-keyed shuffle;
    // the corpus-wide frequency rank rides GlobalRank (total order
    // cnt desc, tok asc), coverage masses are exact integer sums with
    // one final double division.
    "llm_vocab_coverage" -> ((s, dir) => {
      // global (tok, cnt) table rolls up from the shared unigram
      // ledger (r10 verdict item 6) — no fresh corpus tokenize
      val cnts = graft.tools.TokenArtifacts.global(s, dir)
      val tot = cnts.agg(sum("cnt").as("total_tokens"),
        count(lit(1)).as("vocab_size"))
      GlobalRank.withSeq(cnts, "rn", Seq(col("cnt").desc, col("tok").asc))
        .select(col("cnt"), col("rn"),
          explode(array(lit(100L), lit(1000L), lit(10000L))).as("k"))
        .where(col("rn") <= col("k"))
        .groupBy("k").agg(sum("cnt").as("covered_tokens"))
        .crossJoin(broadcast(tot))
        .select(col("k"), col("vocab_size"), col("total_tokens"),
          col("covered_tokens"),
          (col("covered_tokens").cast(DoubleType) /
            col("total_tokens").cast(DoubleType)).as("coverage"))
        .orderBy("k")
    }),

    // ---- tokenizer fertility --------------------------------------------
    // Chars-per-token and tokens-per-doc by language — the fertility
    // table that decides how expensive each language is to tokenize
    // (CJK runs hot on char-level vocabs). Token char mass = chars
    // with every space removed (tokens are space-separated, so this
    // equals Σ len(token) exactly). Map-only scan then a 5-key
    // shuffle; ratios are integer/integer with one double division.
    "llm_token_fertility" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("lang"), nTok.as("ntok"),
          length(translate(col("text"), " ", "")).cast("long").as("tchars"))
        // fertility is defined over non-empty docs: a language whose
        // fixture slice were all whitespace-only docs would otherwise
        // hit 0/0 (Spark NULL vs DuckDB NaN — cross-engine mismatch)
        .where(col("ntok") >= 1)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("ntok").as("total_tokens"),
          sum("tchars").as("total_token_chars"))
        .select(col("lang"), col("n_docs"), col("total_tokens"),
          col("total_token_chars"),
          (col("total_tokens").cast(DoubleType) /
            col("n_docs").cast(DoubleType)).as("toks_per_doc"),
          (col("total_token_chars").cast(DoubleType) /
            col("total_tokens").cast(DoubleType)).as("chars_per_tok"))
        .orderBy("lang")
    }),

    // ---- difference-in-differences --------------------------------------
    // The workhorse causal-lift estimator: treatment = even user ids,
    // post-period = events on/after Jan 16; per event type,
    // DiD = (treat_post − treat_pre) − (ctrl_post − ctrl_pre) of mean
    // event value. One corpus shuffle into 5 rows; every mean is an
    // exact decimal sum over one IEEE division, and the DiD combine is
    // a fixed-order double expression identical on both engines.
    "agg_diff_in_diff" -> ((s, dir) => {
      val cut = lit(cutLit).cast("timestamp")
      val ev = Tables.events(s, dir).select(col("event_type"),
        (col("user_id") % 2 === 0).as("treat"), (col("ts") >= cut).as("post"),
        col("value").cast(DecimalType(18, 6)).as("v"))
      def mean(c: org.apache.spark.sql.Column) =
        sum(when(c, col("v"))).cast(DoubleType) / count_if(c)
      ev.groupBy("event_type")
        .agg(count_if(col("treat") && !col("post")).as("n_treat_pre"),
          count_if(col("treat") && col("post")).as("n_treat_post"),
          count_if(!col("treat") && !col("post")).as("n_ctrl_pre"),
          count_if(!col("treat") && col("post")).as("n_ctrl_post"),
          mean(col("treat") && !col("post")).as("mean_treat_pre"),
          mean(col("treat") && col("post")).as("mean_treat_post"),
          mean(!col("treat") && !col("post")).as("mean_ctrl_pre"),
          mean(!col("treat") && col("post")).as("mean_ctrl_post"))
        .withColumn("did",
          (col("mean_treat_post") - col("mean_treat_pre")) -
            (col("mean_ctrl_post") - col("mean_ctrl_pre")))
        .orderBy("event_type")
    }),

    // ---- CUPED variance reduction ---------------------------------------
    // CUPED-adjusted post-period metric per experiment arm: per user,
    // x = pre-period value sum (the covariate), y = post-period sum;
    // θ = cov(x,y)/var(x) pooled over all users, adjusted arm mean =
    // ȳ_arm − θ·(x̄_arm − x̄). Every Σx, Σy, Σxy, Σx² is exact decimal
    // (per-user sums re-capped at decimal(18,6) so products stay
    // inside decimal(38,12) on both engines); θ and the adjustment are
    // fixed-order double closed forms. Two user-keyed shuffles, a
    // 1-row broadcast of the pooled moments.
    "agg_cuped_adjust" -> ((s, dir) => {
      val cut = lit(cutLit).cast("timestamp")
      val v = col("value").cast(DecimalType(18, 6))
      val zero = lit(0).cast(DecimalType(18, 6))
      val peru = Tables.events(s, dir)
        .groupBy("user_id")
        .agg(coalesce(sum(when(col("ts") < cut, v)), zero)
            .cast(DecimalType(18, 6)).as("x"),
          coalesce(sum(when(col("ts") >= cut, v)), zero)
            .cast(DecimalType(18, 6)).as("y"))
      val g = peru.agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      val theta = (col("n").cast(DoubleType) * col("sxy").cast(DoubleType) -
        col("sx").cast(DoubleType) * col("sy").cast(DoubleType)) /
        (col("n").cast(DoubleType) * col("sxx").cast(DoubleType) -
          col("sx").cast(DoubleType) * col("sx").cast(DoubleType))
      val meanPre = col("ax").cast(DoubleType) / col("n_users")
      val meanPost = col("ay").cast(DoubleType) / col("n_users")
      val gMeanPre = col("sx").cast(DoubleType) / col("n")
      peru.groupBy((col("user_id") % 2).as("arm"))
        .agg(count(lit(1)).as("n_users"), sum("x").as("ax"), sum("y").as("ay"))
        .crossJoin(broadcast(g))
        .select(col("arm"), col("n_users"),
          meanPre.as("mean_pre"), meanPost.as("mean_post"),
          // the θ/adjustment closed forms chain >4 IEEE ops through a
          // decimal→double cast DuckDB does NOT correctly-round
          // (measured: 1-ulp drift at sf0.001), so the finals are 6dp
          round(theta, 6).as("theta"),
          round(meanPost - theta * (meanPre - gMeanPre), 6).as("adj_mean"))
        .orderBy("arm")
    }),

    // ---- common-neighbor link prediction --------------------------------
    // "Suppliers likely to co-occur next": for every NON-adjacent pair
    // of the March-1997 co-occurrence graph, the common-neighbor count
    // and neighborhood-Jaccard score cn/(deg_a + deg_b − cn), top-20.
    // Wedges enumerate keyed by the shared neighbor (candidate volume
    // Σ deg², the graph_triangles bound — never all-pairs); degrees
    // re-attach by node-keyed equi-joins; the cut is TakeOrdered under
    // a total (score, cn, a, b) order.
    "graph_common_neighbors" -> ((s, dir) => {
      val e = GraphStatsQueries.supplierEdges(s, dir)
      val nb = e.select(col("sa").as("c"), col("sb").as("x"))
        .union(e.select(col("sb").as("c"), col("sa").as("x")))
      val deg = nb.groupBy(col("c").as("v")).agg(count(lit(1)).as("deg"))
      val pairs = nb.toDF("c", "a")
        .join(nb.toDF("c2", "b"), col("c") === col("c2") && col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("cn"))
      pairs
        .join(e, pairs("a") === e("sa") && pairs("b") === e("sb"), "left_anti")
        .join(deg.toDF("va", "deg_a"), col("a") === col("va"))
        .join(deg.toDF("vb", "deg_b"), col("b") === col("vb"))
        .select(col("a"), col("b"), col("cn"), col("deg_a"), col("deg_b"),
          (col("cn").cast(DoubleType) /
            (col("deg_a") + col("deg_b") - col("cn")).cast(DoubleType))
            .as("jaccard"))
        .orderBy(col("jaccard").desc, col("cn").desc, col("a"), col("b"))
        .limit(20)
    }),

    // ---- source-diversified top-k ---------------------------------------
    // Retrieval-style diversified selection: the 10 largest documents
    // by n_chars with AT MOST 2 per source (no single crawl domain may
    // dominate a result page / eval slice). The per-source rank rides
    // GlobalRank with part = source (20 groups, each corpus-sized at
    // scale — exactly the few-group shape the helper exists for); the
    // survivor set is ≤ 2·|sources| rows, so the final cut is a
    // TakeOrdered over a bounded input.
    "topk_diverse_sources" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "source", "n_chars")
      GlobalRank.withSeqAndCount(d, "rn_src", "__n_src", Seq("source"),
          Seq(col("n_chars").desc, col("doc_id").asc),
          groupsHint = 64) // crawl/curated source registry, dozens not thousands
        .where(col("rn_src") <= 2)
        .select(col("doc_id"), col("source"), col("n_chars"), col("rn_src"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
        .limit(10)
    })
  )

  val oracles: Map[String, String] = Map(

    "llm_cross_entropy" -> s"""
      |WITH t AS (SELECT lang, doc_id % 2 AS half, unnest($duckToks) AS tok
      |  FROM documents),
      |tf AS (SELECT lang, tok,
      |    count(*) FILTER (half = 0) AS ca,
      |    count(*) FILTER (half = 1) AS cb
      |  FROM t GROUP BY lang, tok),
      |tot AS (SELECT lang, CAST(sum(ca) AS BIGINT) AS na,
      |    CAST(sum(cb) AS BIGINT) AS nb, CAST(count(*) AS BIGINT) AS v
      |  FROM tf GROUP BY lang),
      |p AS (SELECT tf.lang, tot.na, tot.nb, tot.v,
      |    CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE) AS pa,
      |    CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE) AS pb
      |  FROM tf JOIN tot ON tf.lang = tot.lang)
      |SELECT lang, max(v) AS vocab, max(na) AS n_a, max(nb) AS n_b,
      |  CAST(sum(CAST(round(-(pa * ln(pb)), 8) AS DECIMAL(18,8))) AS DOUBLE)
      |    AS cross_entropy,
      |  CAST(sum(CAST(round(pa * ln(pa / pb), 8) AS DECIMAL(18,8))) AS DOUBLE)
      |    AS kl_div
      |FROM p GROUP BY lang ORDER BY lang""".stripMargin,

    "llm_vocab_coverage" -> s"""
      |WITH t AS (SELECT unnest($duckToks) AS tok FROM documents),
      |c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
      |r AS (SELECT tok, CAST(cnt AS BIGINT) AS cnt,
      |    CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS rn
      |  FROM c),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_tokens,
      |    CAST(count(*) AS BIGINT) AS vocab_size FROM c),
      |k AS (SELECT CAST(unnest([100, 1000, 10000]) AS BIGINT) AS k)
      |SELECT k.k, tot.vocab_size, tot.total_tokens,
      |  CAST(sum(r.cnt) AS BIGINT) AS covered_tokens,
      |  CAST(sum(r.cnt) AS DOUBLE) / CAST(tot.total_tokens AS DOUBLE)
      |    AS coverage
      |FROM k JOIN r ON r.rn <= k.k CROSS JOIN tot
      |GROUP BY k.k, tot.vocab_size, tot.total_tokens ORDER BY k.k""".stripMargin,

    "llm_token_fertility" -> s"""
      |WITH d AS (SELECT lang,
      |    CAST(len($duckToks) AS BIGINT) AS ntok,
      |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS tchars
      |  FROM documents)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  -- WHERE below mirrors the Spark-side non-empty-doc guard
      |  CAST(sum(ntok) AS BIGINT) AS total_tokens,
      |  CAST(sum(tchars) AS BIGINT) AS total_token_chars,
      |  CAST(sum(ntok) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS toks_per_doc,
      |  CAST(sum(tchars) AS DOUBLE) / CAST(sum(ntok) AS DOUBLE) AS chars_per_tok
      |FROM d WHERE ntok >= 1 GROUP BY lang ORDER BY lang""".stripMargin,

    "agg_diff_in_diff" -> s"""
      |WITH ev AS (SELECT event_type,
      |    user_id % 2 = 0 AS treat, ts >= TIMESTAMP '$cutLit' AS post,
      |    CAST(value AS DECIMAL(18,6)) AS v
      |  FROM events),
      |m AS (SELECT event_type,
      |    CAST(count(*) FILTER (treat AND NOT post) AS BIGINT) AS n_treat_pre,
      |    CAST(count(*) FILTER (treat AND post) AS BIGINT) AS n_treat_post,
      |    CAST(count(*) FILTER (NOT treat AND NOT post) AS BIGINT) AS n_ctrl_pre,
      |    CAST(count(*) FILTER (NOT treat AND post) AS BIGINT) AS n_ctrl_post,
      |    CAST(sum(v) FILTER (treat AND NOT post) AS DOUBLE)
      |      / count(*) FILTER (treat AND NOT post) AS mean_treat_pre,
      |    CAST(sum(v) FILTER (treat AND post) AS DOUBLE)
      |      / count(*) FILTER (treat AND post) AS mean_treat_post,
      |    CAST(sum(v) FILTER (NOT treat AND NOT post) AS DOUBLE)
      |      / count(*) FILTER (NOT treat AND NOT post) AS mean_ctrl_pre,
      |    CAST(sum(v) FILTER (NOT treat AND post) AS DOUBLE)
      |      / count(*) FILTER (NOT treat AND post) AS mean_ctrl_post
      |  FROM ev GROUP BY event_type)
      |SELECT event_type, n_treat_pre, n_treat_post, n_ctrl_pre, n_ctrl_post,
      |  mean_treat_pre, mean_treat_post, mean_ctrl_pre, mean_ctrl_post,
      |  (mean_treat_post - mean_treat_pre) - (mean_ctrl_post - mean_ctrl_pre)
      |    AS did
      |FROM m ORDER BY event_type""".stripMargin,

    "agg_cuped_adjust" -> s"""
      |WITH peru AS (SELECT user_id,
      |    CAST(coalesce(sum(CASE WHEN ts < TIMESTAMP '$cutLit'
      |      THEN CAST(value AS DECIMAL(18,6)) END), 0) AS DECIMAL(18,6)) AS x,
      |    CAST(coalesce(sum(CASE WHEN ts >= TIMESTAMP '$cutLit'
      |      THEN CAST(value AS DECIMAL(18,6)) END), 0) AS DECIMAL(18,6)) AS y
      |  FROM events GROUP BY user_id),
      |g AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))) AS sxy,
      |    sum(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6))) AS sxx
      |  FROM peru),
      |a AS (SELECT user_id % 2 AS arm, CAST(count(*) AS BIGINT) AS n_users,
      |    sum(x) AS ax, sum(y) AS ay FROM peru GROUP BY arm)
      |SELECT a.arm, a.n_users,
      |  CAST(ax AS DOUBLE) / n_users AS mean_pre,
      |  CAST(ay AS DOUBLE) / n_users AS mean_post,
      |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS theta,
      |  round(CAST(ay AS DOUBLE) / n_users
      |    - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      * (CAST(ax AS DOUBLE) / n_users - CAST(sx AS DOUBLE) / n), 6)
      |    AS adj_mean
      |FROM a CROSS JOIN g ORDER BY arm""".stripMargin,

    "graph_common_neighbors" -> s"""
      |WITH ${GraphStatsQueries.edgesSql},
      |nb AS (SELECT sa AS c, sb AS x FROM e
      |  UNION ALL SELECT sb AS c, sa AS x FROM e),
      |deg AS (SELECT c AS v, CAST(count(*) AS BIGINT) AS deg
      |  FROM nb GROUP BY c),
      |p AS (SELECT n1.x AS a, n2.x AS b, CAST(count(*) AS BIGINT) AS cn
      |  FROM nb n1 JOIN nb n2 ON n1.c = n2.c AND n1.x < n2.x
      |  GROUP BY n1.x, n2.x),
      |ne AS (SELECT * FROM p WHERE NOT EXISTS
      |  (SELECT 1 FROM e WHERE e.sa = p.a AND e.sb = p.b))
      |SELECT ne.a, ne.b, ne.cn, da.deg AS deg_a, db.deg AS deg_b,
      |  CAST(ne.cn AS DOUBLE) / CAST(da.deg + db.deg - ne.cn AS DOUBLE)
      |    AS jaccard
      |FROM ne JOIN deg da ON ne.a = da.v JOIN deg db ON ne.b = db.v
      |ORDER BY jaccard DESC, cn DESC, a, b LIMIT 20""".stripMargin,

    "topk_diverse_sources" -> """
      |WITH r AS (SELECT doc_id, source, n_chars,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rn_src
      |  FROM documents)
      |SELECT doc_id, source, n_chars, rn_src FROM r
      |WHERE rn_src <= 2 ORDER BY n_chars DESC, doc_id LIMIT 10""".stripMargin
  )
}
