package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryUtils._
import graft.functions.VectorFunctions.{vecDot, vecNorm}
import graft.sources.Tables

/** §2.K — LLM-data-pipeline operators over `documents` / `embeddings`.
  *
  * Scale design (100 TB):
  *  - `llm_dedup_near` is a prefix-filtered (PPJoin-style) exact shingle
  *    Jaccard join: under a fixed global shingle order, only each
  *    document's order-minimal prefix is exploded for candidate
  *    generation, so candidate volume tracks true near-dup density
  *    instead of O(n²). The DuckDB oracle brute-forces the same
  *    semantics — prefix filtering at threshold t is lossless.
  *  - vector similarity uses the codegen'd FloatVecDot expression, not
  *    interpreted lambdas (see VectorFunctions).
  *  - brute-force kNN here is the correctness oracle; the LSH/IVF scale
  *    path ships alongside in ScaleQueries.
  */
object LlmQueries {

  import graft.functions.TextShingles.{mkShingles, verifyJaccard06}

  /** PPJoin-style prefix-filtered exact-Jaccard near-dup pairs over a
    * (doc_id, text) frame — THE llm_dedup_near body, frame-parametric
    * so ScaleDryRun's k× replay measures the SHIPPED pipeline, not a
    * copy (r8 verdict item 3).
    *
    * PPJoin prefix filtering
    * is lossless under ANY fixed global total order on shingles: each
    * doc keeps its first L(n) = n - ceil(0.6 n) + 1 shingles under
    * that order, and any pair with J >= 0.6 must share a prefix
    * shingle. The canonical PPJoin order — (document frequency ASC,
    * shingle ASC) — makes prefixes the corpus-RAREST shingles, so
    * candidate volume tracks true near-dup density (measured at
    * sf0.1: 450k lexicographic-prefix candidates → rare-prefix
    * candidates orders of magnitude fewer). Costs one df aggregation
    * + one join + one per-doc window; pays for itself because every
    * candidate pair re-attaches two full shingle arrays in the
    * verify. Candidates are verified exactly (merge-pass
    * SortedIntersectCount, TextShingles.verifyJaccard06, shared with
    * the LSH operators) — the oracle output cannot move.
    * explode_outer (not explode) so the optimizer has no inferred
    * `size(sh) > 0` filter to push below the projection — that
    * pushdown would re-evaluate the shingle kernel a second time per
    * row in the scan stage.
    * Same staging as llm_dedup_ngram (PipelineQueries): the shingle
    * and prefix tables feed both sides of a self-join with no
    * exchange reuse across the renamed sides, so both are eagerly
    * localCheckpoint'ed; document frequency is a window count over
    * the exploded shingles (one pass) instead of groupBy + re-join
    * (two evaluations of the explode pipeline). Candidates then pass
    * two further lossless cuts: the length-ratio filter
    * (J >= 0.6 forces 3*max(na,nb) <= 5*min(na,nb)) and PPJoin's
    * positional bound taken as a MINIMUM over all shared prefix
    * shingles — |A∩B| <= min(i-1,j-1) + min(na-i,nb-j) + 1 at every
    * shared position, so a true pair satisfies the bound everywhere.
    */
  def nearDupPairs(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      // r14 (guide §2.3): the doc_id exchange moves the TEXT, and the
      // shingle kernel runs AFTER it — the old order shuffled the
      // shingle arrays, ~3× the text bytes, to decide only row
      // placement. The projection stays single-eval (sh is referenced
      // by both the column and size(); CollapseProject does not inline
      // a non-cheap alias into multiple references), and the
      // checkpoint contents are row-identical.
      val sh = graft.tools.Materialize.eager("dedup_near.sh",
        docs
          .select(col("doc_id"), col("text"))
          .repartition(
            docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"), mkShingles(col("text")).as("sh"))
          .withColumn("n", size(col("sh"))))
      val ex = sh.select(col("doc_id"), col("n"), explode_outer(col("sh")).as("s"))
        .where(col("s").isNotNull)
      val wdf = Window.partitionBy("s")
      val w = Window.partitionBy("doc_id").orderBy(col("df").asc, col("s").asc)
      val pref = graft.tools.Materialize.eager("dedup_near.pref",
        ex.withColumn("df", count(lit(1)).over(wdf))
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= col("n") - ceil(col("n") * lit(0.6)).cast("int") + 1)
          .select("doc_id", "s", "rk", "n"))
      val pa = pref.select(col("doc_id").as("a_id"), col("s"),
        col("rk").as("rka"), col("n").as("na"))
      val pb = pref.select(col("doc_id").as("b_id"), col("s"),
        col("rk").as("rkb"), col("n").as("nb"))
      val bound = least(col("rka") - 1, col("rkb") - 1) +
        least(col("na") - col("rka"), col("nb") - col("rkb")) + lit(1)
      val lenOk = greatest(col("na"), col("nb")) * 3 <=
        least(col("na"), col("nb")) * 5
      val cand = pa.join(pb, "s")
        .where(col("a_id") < col("b_id") && lenOk)
        .groupBy("a_id", "b_id", "na", "nb").agg(min(bound).as("mb"))
        .where(col("mb") * 8 >= (col("na") + col("nb")) * 3)
        .select("a_id", "b_id")
      verifyJaccard06(cand, sh)
  }

  val queries: Map[String, QFn] = Map(
    "llm_dedup_exact" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy(md5(col("text")).as("text_md5"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("text_md5")
    }),

    "llm_dedup_near" -> ((s, dir) => nearDupPairs(Tables.documents(s, dir))),

    "llm_simsearch_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.where(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      emb.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          (vecDot(col("embedding"), col("qv"))
            / (vecNorm(col("embedding")) * vecNorm(col("qv")))).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(10)
    }),

    // EXACT all-corpus 1-NN — no longer the whitelisted brute-force
    // theta join: AnnCodebook.exactNN1 routes the same semantics
    // through k-means cells with triangle-inequality cell pruning
    // (lossless — see its scaladoc for the bound), so the plan is
    // cell-equi-joins plus K-row broadcasts. The DuckDB oracle stays
    // brute force: pruning must not move a single output bit.
    "llm_knn_join" -> ((s, dir) =>
      graft.functions.AnnCodebook.exactNN1(s, dir).orderBy("vec_id")),

    "llm_text_stats" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          (sum("n_chars").cast("double") / count(lit(1))).as("avg_chars"),
          (sum(size(split(col("text"), " ")).cast("long")).cast("double")
            / count(lit(1))).as("avg_tokens"),
          count_distinct(col("source")).as("n_sources"))
        .orderBy("lang")
    }),

    // tf only needs the 20 REPORTED docs, so the tokenize+count runs
    // over those 20 rows (filter pushed to the scan), while the
    // corpus-wide df comes from the persisted document-frequency
    // ledger (r12) — the pre-r12 form tokenized and shuffled the WHOLE
    // corpus twice (tf then df) to report 20 documents. Tokenization
    // is the one corpus rule (whitespace, empties dropped) on both
    // sides — ledger, tf, and the DuckDB oracle agree by construction.
    "llm_tfidf_topterms" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val tf = d.where(col("doc_id") < 20)
        .select(col("doc_id"),
          explode(filter(split(col("text"), " "), t => t =!= "")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dft = graft.tools.TokenArtifacts.dfGlobal(s, dir)
        .select(col("tok").as("term"), col("ndoc").as("df"))
      val n = d.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term").asc)
      dft.join(broadcast(tf), "term").crossJoin(broadcast(n))
        .withColumn("tfidf", col("tf") * log(col("n_docs").cast("double") / col("df")))
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 5)
        .select(col("doc_id"), col("rn"), col("term"), col("tf"), col("df"),
          r4(col("tfidf")).as("tfidf"))
        .orderBy("doc_id", "rn")
    }),

    "llm_ngrams_bigram" -> ((s, dir) => {
      // r14: bigrams via the codegen'd RawBigramList kernel — identical
      // raw token stream (split ' ', empties KEPT, as declared) and
      // identical "w1 w2" concatenation; the transform(sequence(...))
      // form interpreted its lambda per element.
      Tables.documents(s, dir)
        .select(explode_outer(
          graft.functions.TextNGrams.mkRawBigrams(col("text"))).as("bigram"))
        .where(col("bigram").isNotNull)
        .groupBy("bigram")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram").asc)
        .limit(20)
    }),

    "llm_multimodal_join" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val e = Tables.embeddings(s, dir)
      d.join(e, d("doc_id") === e("vec_id"))
        .withColumn("nrm", vecNorm(col("embedding")))
        .groupBy("lang", "label")
        .agg(count(lit(1)).as("n_docs"), r4(avg(col("nrm"))).as("avg_norm"))
        .orderBy("lang", "label")
    })
  )

  private val dupNearOracle =
    graft.functions.TextShingles.duckShingleCte +
    """,
      |p AS (SELECT a.doc_id a_id, b.doc_id b_id,
      |        len(list_intersect(a.sh, b.sh)) inter,
      |        len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) uni
      |      FROM s a JOIN s b ON a.doc_id < b.doc_id)
      |SELECT a_id AS doc_a, b_id AS doc_b, CAST(inter AS DOUBLE) / uni AS jaccard
      |FROM p WHERE inter * 10 >= uni * 6 ORDER BY doc_a, doc_b""".stripMargin

  private val simsearchOracle =
    """WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      |           FROM embeddings WHERE vec_id = 0),
      |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
      |      FROM embeddings WHERE vec_id <> 0)
      |SELECT e.vec_id,
      |  list_aggregate(list_transform(list_zip(e.ev, q.qv), p -> p[1] * p[2]), 'sum') /
      |  (sqrt(list_aggregate(list_transform(e.ev, x -> x * x), 'sum')) *
      |   sqrt(list_aggregate(list_transform(q.qv, x -> x * x), 'sum'))) AS cos_sim
      |FROM e, q ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin

  private val knnOracle =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
      |           FROM embeddings),
      |n AS (SELECT vec_id, ev, sqrt(list_aggregate(list_transform(ev, x -> x * x), 'sum')) AS nrm FROM e),
      |p AS (SELECT a.vec_id a_id, b.vec_id b_id,
      |        list_aggregate(list_transform(list_zip(a.ev, b.ev), z -> z[1] * z[2]), 'sum')
      |          / (a.nrm * b.nrm) AS cos_sim
      |      FROM n a JOIN n b ON a.vec_id <> b.vec_id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY a_id ORDER BY cos_sim DESC, b_id ASC) rn FROM p)
      |SELECT a_id AS vec_id, b_id AS nn_id, cos_sim FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin

  private val tfidfOracle =
    """WITH tok AS (SELECT doc_id,
      |  unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) tf FROM tok GROUP BY 1, 2),
      |dft AS (SELECT term, count(*) df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) n_docs FROM documents),
      |sc AS (SELECT tf.doc_id, tf.term, tf.tf, dft.df,
      |         tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dft.df) AS tfidf
      |       FROM tf JOIN dft USING (term) CROSS JOIN n WHERE tf.doc_id < 20),
      |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) rn FROM sc)
      |SELECT doc_id, rn, term, tf, df, round(tfidf, 4) AS tfidf
      |FROM r WHERE rn <= 5 ORDER BY doc_id, rn""".stripMargin

  val oracles: Map[String, String] = Map(
    "llm_dedup_exact" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY text_md5""".stripMargin,

    "llm_dedup_near" -> dupNearOracle,
    "llm_simsearch_topk" -> simsearchOracle,
    "llm_knn_join" -> knnOracle,

    "llm_text_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(SUM(n_chars) AS DOUBLE) / count(*) AS avg_chars,
        |  CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / count(*) AS avg_tokens,
        |  COUNT(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "llm_tfidf_topterms" -> tfidfOracle,

    "llm_ngrams_bigram" ->
      """SELECT bigram, count(*) AS n FROM (
        |  SELECT unnest(list_transform(generate_series(1, len(tok) - 1),
        |    i -> tok[i] || ' ' || tok[i+1])) AS bigram
        |  FROM (SELECT string_split(text, ' ') tok FROM documents) WHERE len(tok) >= 2)
        |GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 20""".stripMargin,

    "llm_multimodal_join" ->
      """SELECT lang, label, count(*) AS n_docs,
        |  round(avg(sqrt(list_aggregate(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 4) AS avg_norm
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |GROUP BY lang, label ORDER BY lang, label""".stripMargin
  )
}
