package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.QueryUtils._
import graft.sources.Tables

/** Corpus-health batch (round 2, batch 8): label-outlier detection over
  * embeddings (the mislabeled-sample sweep every labeled dataset needs)
  * and a Zipf-law fit per language (the token-distribution sanity check
  * for synthetic or corrupted corpora).
  *
  * Scale notes (100 TB):
  *  - `llm_label_outliers` is long-form relational algebra: one
  *    bounded aggregation to the per-(label, pos) centroid (label
  *    cardinality × dim rows — catalog-sized, AQE broadcasts it), one
  *    join back to the exploded vectors co-partitioned on (label, pos),
  *    one per-vector reduction, one bounded top-k window per label.
  *    Nothing grows faster than the corpus.
  *  - `llm_zipf_slope` is tf-idf's shuffle shape (corpus-linear
  *    (lang, token) counts) plus per-lang GlobalRank ranks and one
  *    regression aggregate per language.
  *
  * Determinism: the outlier query's floating sums (centroid means,
  * dot/norm reductions) are rounded-then-decimal-summed — order-free
  * and engine-exact. The Zipf regression aggregates accumulate raw
  * doubles like every other regr_/stddev query in the surface and rely
  * on the established r4 convention (inherently order-dependent stats
  * round to 4 on both engines — QueryUtils scaladoc).
  */
object CorpusHealthQueries {

  val queries: Map[String, QFn] = Map(

    // ---- per-label embedding outliers (mislabel candidates) -------------
    // For each label: the 3 vectors with the LOWEST cosine to their own
    // label centroid. Centroid means and all dot/norm reductions use
    // rounded decimal partials so no summation order (Spark partitioning
    // or DuckDB's) can move a bit.
    "llm_label_outliers" -> ((s, dir) => {
      val ex = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("vec_id"), col("label"), col("pos"),
          col("x").cast("double").as("x"))
      val cent = ex.groupBy("label", "pos")
        .agg((sum(round(col("x"), 9).cast(DecimalType(18, 9)))
          .cast(DoubleType) / count(lit(1))).as("m"))
      // the centroid self-norm is constant per label: sum it ONCE over
      // the catalog-sized centroid table and join it back, instead of
      // re-summing the identical 64 terms for every vector inside the
      // big (vec_id, label) aggregation (same decimal terms, same
      // order-free sum — bit-identical, at a fraction of the work)
      val labelNorm = cent.groupBy("label")
        .agg(sum(round(col("m") * col("m"), 12).cast(DecimalType(18, 12)))
          .cast(DoubleType).as("mm"))
      val joined = ex.join(cent, Seq("label", "pos"))
      val per = joined.groupBy("vec_id", "label")
        .agg(
          sum(round(col("x") * col("m"), 12).cast(DecimalType(18, 12)))
            .cast(DoubleType).as("dot"),
          sum(round(col("x") * col("x"), 12).cast(DecimalType(18, 12)))
            .cast(DoubleType).as("xx"))
        .join(labelNorm, "label")
        .where(col("xx") > 0 && col("mm") > 0)
        .select(col("vec_id"), col("label"),
          r4(col("dot") / (sqrt(col("xx")) * sqrt(col("mm")))).as("cos_cent"))
      // bottom-3 per label via TopKPerGroupExec (bounded per-group
      // heaps over the per-vector table — no label-cardinality-task
      // window); ranking the ≤ 3×|labels| cut afterwards is bounded.
      val cut = graft.plans.GraftOps.topKPerGroup(per, Seq("label"),
        Seq("cos_cent" -> true, "vec_id" -> true), 3)
      val w = Window.partitionBy("label")
        .orderBy(col("cos_cent").asc, col("vec_id").asc)
      cut.withColumn("rk", row_number().over(w).cast("long"))
        .select("label", "rk", "vec_id", "cos_cent")
        .orderBy("label", "rk")
    }),

    // ---- ANN recall@1 vs exact ground truth ------------------------------
    // Recall@1 of the own-cell ANN probe (same k-means codebook as
    // llm_ann_ivf, 64 cells) against the EXACT 1-NN, measured on a
    // deterministic 256-vector hash-sampled eval slice — the round-2
    // "sampled at scale" prose, now in code: the slice is top-256 by
    // (md5-hash, vec_id), so its size is constant in the corpus and
    // both sides stay corpus-linear. The exact side reuses
    // AnnCodebook's triangle-pruned exact 1-NN (no brute-force theta
    // join anywhere); the ANN side is one cell-equi-join over the
    // sampled vectors. A sampled vector whose cell holds no partner
    // counts as a miss (left join).
    "llm_ann_recall" -> ((s, dir) => {
      import graft.functions.AnnCodebook
      import graft.functions.VectorFunctions.vecDot
      val (e, _) = AnnCodebook.indexed(s, dir)
      val sample = AnnCodebook.hashSample(e, 256)
      val exact = AnnCodebook.exactNN1From(s, dir, Some(sample))
        .select(col("vec_id").as("a_id"), col("nn_id").as("nn_exact"))
      val aS = e.select(col("vec_id").as("a_id"), col("cell"),
        col("embedding").as("a_v"), col("nrm").as("a_n"))
        .join(broadcast(sample), Seq("a_id"))
      val bS = e.select(col("vec_id").as("b_id"), col("cell"),
        col("embedding").as("b_v"), col("nrm").as("b_n"))
      val ann = aS.join(bS, Seq("cell"))
        .where(col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"),
          (vecDot(col("a_v"), col("b_v")) / (col("a_n") * col("b_n"))).as("cos_sim"))
        .groupBy("a_id")
        .agg(max_by(col("b_id"), struct(col("cos_sim"), -col("b_id"))).as("nn_ann"))
      exact.join(ann, Seq("a_id"), "left")
        .agg(count(lit(1)).as("n_vecs"),
          count_if(col("nn_ann") === col("nn_exact")).as("n_match"))
        .select(col("n_vecs"), col("n_match"),
          round(col("n_match").cast("double") / col("n_vecs"), 4).as("recall_at_1"))
    }),

    // ---- Zipf-law slope per language ------------------------------------
    // Fit log2(count) ~ log2(rank) over the token frequency table of
    // each language; natural text lands near slope -1, templated or
    // synthetic text deviates hard. Rank ties break on the token so the
    // regression inputs are identical on both engines.
    "llm_zipf_slope" -> ((s, dir) => {
      // (lang, tok) counts roll up from the shared unigram ledger
      // (r10 verdict item 6) — no fresh corpus tokenize
      val tf = graft.tools.TokenArtifacts.byLang(s, dir)
        .withColumnRenamed("cnt", "c")
      // per-lang rank over the corpus-vocabulary (lang, token) table:
      // GlobalRank (5 langs), the llm_token_gini shape
      GlobalRank.withSeqAndCount(tf, "rank", "__zs_n", Seq("lang"),
          Seq(col("c").desc, col("tok").asc), groupsHint = 5)
        .groupBy("lang")
        .agg(
          r4(regr_slope(log2(col("c")), log2(col("rank")))).as("zipf_slope"),
          r4(regr_r2(log2(col("c")), log2(col("rank")))).as("fit_r2"),
          count(lit(1)).as("n_types"))
        .orderBy("lang")
    })
  )

  val oracles: Map[String, String] = Map(

    "llm_label_outliers" ->
      """WITH ex AS (SELECT vec_id, label, x.i AS pos, CAST(x.v AS DOUBLE) AS x
        |  FROM (SELECT vec_id, label,
        |          unnest(list_transform(generate_series(1, len(embedding)),
        |            i -> struct_pack(i := i - 1, v := embedding[i]))) AS x
        |        FROM embeddings)),
        |cent AS (SELECT label, pos,
        |    CAST(sum(CAST(round(x, 9) AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS m
        |  FROM ex GROUP BY label, pos),
        |label_norm AS (SELECT label,
        |    CAST(sum(CAST(round(m * m, 12) AS DECIMAL(18,12))) AS DOUBLE) AS mm
        |  FROM cent GROUP BY label),
        |per AS (SELECT vec_id, ex.label AS label,
        |    CAST(sum(CAST(round(x * m, 12) AS DECIMAL(18,12))) AS DOUBLE) AS dot,
        |    CAST(sum(CAST(round(x * x, 12) AS DECIMAL(18,12))) AS DOUBLE) AS xx
        |  FROM ex JOIN cent ON ex.label = cent.label AND ex.pos = cent.pos
        |  GROUP BY vec_id, ex.label),
        |scored AS (SELECT vec_id, per.label AS label,
        |    round(dot / (sqrt(xx) * sqrt(mm)), 4) AS cos_cent
        |  FROM per JOIN label_norm ON per.label = label_norm.label
        |  WHERE xx > 0 AND mm > 0),
        |ranked AS (SELECT label, vec_id, cos_cent,
        |    row_number() OVER (PARTITION BY label
        |      ORDER BY cos_cent ASC, vec_id ASC) AS rk
        |  FROM scored)
        |SELECT label, CAST(rk AS BIGINT) AS rk, vec_id, cos_cent
        |FROM ranked WHERE rk <= 3 ORDER BY label, rk""".stripMargin,

    "llm_ann_recall" -> (
      s"WITH ${graft.functions.AnnCodebook.oracleCtes}," +
      """
        |ke AS (SELECT e.vec_id, list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS ev,
        |    kcells.cell AS cell
        |  FROM embeddings e JOIN kcells ON e.vec_id = kcells.vec_id),
        |n AS (SELECT vec_id, ev, cell,
        |    sqrt(list_aggregate(list_transform(ev, x -> x * x), 'sum')) AS nrm
        |  FROM ke),
        |ksmp AS (SELECT vec_id AS a_id FROM (
        |    SELECT vec_id, row_number() OVER (ORDER BY
        |      ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT, vec_id) AS rk
        |    FROM embeddings) WHERE rk <= 256),
        |p AS (SELECT a.vec_id a_id, b.vec_id b_id, a.cell acell, b.cell bcell,
        |    list_aggregate(list_transform(list_zip(a.ev, b.ev), z -> z[1] * z[2]), 'sum')
        |      / (a.nrm * b.nrm) AS cos_sim
        |  FROM n a JOIN ksmp ON a.vec_id = ksmp.a_id
        |  JOIN n b ON a.vec_id <> b.vec_id),
        |ex AS (SELECT a_id, b_id AS nn_exact FROM (
        |    SELECT a_id, b_id, row_number() OVER (PARTITION BY a_id
        |      ORDER BY cos_sim DESC, b_id ASC) rn FROM p) WHERE rn = 1),
        |an AS (SELECT a_id, b_id AS nn_ann FROM (
        |    SELECT a_id, b_id, row_number() OVER (PARTITION BY a_id
        |      ORDER BY cos_sim DESC, b_id ASC) rn FROM p WHERE acell = bcell)
        |  WHERE rn = 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(count_if(an.nn_ann = ex.nn_exact) AS BIGINT) AS n_match,
        |  round(count_if(an.nn_ann = ex.nn_exact) * 1.0 / count(*), 4) AS recall_at_1
        |FROM ex LEFT JOIN an USING (a_id)""".stripMargin),

    "llm_zipf_slope" ->
      """WITH tf AS (SELECT lang,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        |  FROM documents),
        |c AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM tf GROUP BY lang, tok),
        |r AS (SELECT lang, c,
        |    row_number() OVER (PARTITION BY lang ORDER BY c DESC, tok ASC) AS rank
        |  FROM c)
        |SELECT lang,
        |  round(regr_slope(log2(c), log2(rank)), 4) AS zipf_slope,
        |  round(regr_r2(log2(c), log2(rank)), 4) AS fit_r2,
        |  CAST(count(*) AS BIGINT) AS n_types
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin
  )
}
