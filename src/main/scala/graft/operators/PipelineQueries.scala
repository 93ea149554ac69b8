package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.QueryUtils._
import graft.sources.Tables

/** §2.N (continued) — training-data pipeline additions: deterministic
  * hash sampling (reproducible corpus down-sampling — the workhorse of
  * every ablation/holdout split at 100 TB), stratified per-language
  * sampling, character n-gram Jaccard near-dup (the brief's fourth dedup
  * family member, robust where token shingles miss overlap), and an
  * explicitly salted skew-safe JOIN (the join-side sibling of
  * `agg_skew_salted`).
  *
  * Scale notes:
  *  - hash sampling is a map-only filter — no shuffle, no state, and the
  *    same rows are selected on any cluster size or partitioning (the
  *    md5-derived bucket is a pure function of the row key);
  *  - stratified sampling is one window per stratum key — a single
  *    shuffle keyed by the stratum, bounded output per group;
  *  - char-20-gram near-dup reuses the PPJoin prefix-filter machinery of
  *    `llm_dedup_near` (candidates from order-minimal rare-gram
  *    prefixes, not O(n²)) and the shared merge-pass verify kernel;
  *  - the salted join replicates the small build side R times instead of
  *    letting one hot probe key serialize into a single reducer; the
  *    decimal partials make it provably equal to the unsalted oracle.
  */
object PipelineQueries {

  import graft.functions.TextShingles.{mkCharGrams, mkShingles, verifyJaccard}

  val queries: Map[String, QFn] = Map(
    // ---- deterministic 10% hash sample ---------------------------------
    "llm_sample_hash" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("bucket", hash60(col("doc_id").cast("string")) % 100)
        .where(col("bucket") < 10)
        .select(col("doc_id"), col("lang"), col("source"), col("bucket"))
        .orderBy("doc_id")
    }),

    // ---- stratified per-language sample (k=20 per stratum) -------------
    "llm_sample_stratified" -> ((s, dir) => {
      // top-20 per lang via the custom TopKPerGroupExec (bounded
      // per-group heaps, one pass — no 5-task corpus window); ranking
      // the ≤ 5×20-row cut afterwards is a bounded window.
      val hashed = Tables.documents(s, dir)
        .withColumn("h", hash60(col("doc_id").cast("string")))
        .select(col("doc_id"), col("lang"), col("h"))
      val cut = graft.plans.GraftOps.topKPerGroup(hashed, Seq("lang"),
        Seq("h" -> true, "doc_id" -> true), 20)
      val w = Window.partitionBy("lang")
        .orderBy(col("h").asc, col("doc_id").asc)
      cut.withColumn("rk", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("lang"), col("rk"))
        .orderBy("doc_id")
    }),

    // ---- character 20-gram Jaccard near-dup (threshold 0.7) -------------
    // Same PPJoin shape as llm_dedup_near, over code-point 20-grams: each
    // doc explodes only its order-minimal prefix of n - ceil(0.7n) + 1
    // grams under (document frequency ASC, gram ASC), so a pair with
    // J >= 0.7 must share a prefix gram (lossless), and candidate volume
    // tracks the corpus-RAREST grams rather than O(n²). On top of the
    // prefix filter, the candidate join applies PPJoin's POSITIONAL
    // filter: if a shared gram sits at rank i of A's grams and rank j of
    // B's (both ranked by the same global (df, gram) order), then
    // |A∩B| <= min(i-1, j-1) + min(na-i, nb-j) + 1 — grams strictly
    // before the match in one doc can only intersect grams strictly
    // before it in the other, and likewise after. A true pair passes
    // this bound at EVERY shared gram (the bound dominates the true
    // intersection), so keeping a pair only when its MINIMUM bound over
    // all shared prefix grams satisfies
    // bound*17 >= 7*(na+nb)  (i.e. bound >= ceil(0.7/1.7 * (na+nb)))
    // is lossless — and strictly stronger than testing any single
    // match. A third lossless cut is the LENGTH filter: J >= 0.7 forces
    // 7*max(na,nb) <= 10*min(na,nb), applied inside the join. The
    // DuckDB oracle brute-forces the same semantics.
    "llm_dedup_ngram" -> ((s, dir) => {
      // The gram table and its prefix table each feed BOTH sides of a
      // self-join; Spark plans no exchange reuse across the renamed
      // sides (measured: the explode+window pipeline executed 4x, ~2x
      // the query's total cost), so both intermediates are eagerly
      // localCheckpoint'ed — the standard materialize-the-shared-
      // intermediate move, same pattern as llm_dedup_cluster's
      // iteration state. Both tables are corpus-linear and compact
      // (grams: one array per doc; prefix: ~30% of gram occurrences),
      // stored as executor-local blocks, never a driver collect.
      // r14 (guide §2.3): repartition the TEXT, gram AFTER the exchange
      // — 20-gram arrays are ~20× the text bytes (every code point
      // starts a gram), so the old order shuffled an order of magnitude
      // more than needed to decide row placement. Checkpoint contents
      // are row-identical; the kernel stays single-eval (non-cheap
      // alias, CollapseProject does not duplicate it).
      val sh = graft.tools.Materialize.eager("dedup_ngram.sh",
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text"))
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"), mkCharGrams(col("text")).as("sh"))
          .withColumn("n", size(col("sh"))))
      // explode_outer (not explode): no inferred size(sh) > 0 generator
      // filter for the optimizer to push below the projection, which
      // would re-evaluate the gram kernel in the scan stage
      val ex = sh.select(col("doc_id"), col("n"), explode_outer(col("sh")).as("s"))
        .where(col("s").isNotNull)
      // document frequency as a window count over the gram — one pass
      // over the exploded grams (two window shuffles), instead of
      // groupBy + re-join, which would evaluate the explode pipeline
      // twice (measured ~2x the candidate-generation cost)
      val wdf = Window.partitionBy("s")
      val w = Window.partitionBy("doc_id").orderBy(col("df").asc, col("s").asc)
      val pref = graft.tools.Materialize.eager("dedup_ngram.pref",
        ex.withColumn("df", count(lit(1)).over(wdf))
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= col("n") - ceil(col("n") * lit(0.7)).cast("int") + 1)
          .select("doc_id", "s", "rk", "n"))
      val pa = pref.select(col("doc_id").as("a_id"), col("s"),
        col("rk").as("rka"), col("n").as("na"))
      val pb = pref.select(col("doc_id").as("b_id"), col("s"),
        col("rk").as("rkb"), col("n").as("nb"))
      val bound = least(col("rka") - 1, col("rkb") - 1) +
        least(col("na") - col("rka"), col("nb") - col("rkb")) + lit(1)
      val lenOk = greatest(col("na"), col("nb")) * 7 <=
        least(col("na"), col("nb")) * 10
      val cand = pa.join(pb, "s")
        .where(col("a_id") < col("b_id") && lenOk)
        .groupBy("a_id", "b_id", "na", "nb").agg(min(bound).as("mb"))
        .where(col("mb") * 17 >= (col("na") + col("nb")) * 7)
        .select("a_id", "b_id")
      verifyJaccard(cand, sh, tenths = 7)
    }),

    // ---- containment (asymmetric Jaccard) dedup --------------------------
    // Directed pairs where ≥ 90% of A's shingles appear in B —
    // C(A,B) = |A∩B| / |A|. Symmetric-Jaccard dedup MISSES truncation
    // duplicates (a doc that is a prefix/excerpt of a longer one scores
    // low J but C ≈ 1); this operator is the excerpt sweep. Candidates:
    // A explodes only its rare-first prefix of n_a − ⌈0.9·n_a⌉ + 1
    // shingles (lossless: if C ≥ 0.9, fewer than an A-prefix's worth of
    // A-shingles are missing from B, so B shares at least one prefix
    // shingle); B explodes all shingles. Verification is the shared
    // merge-pass SortedIntersectCount with the integer-exact threshold
    // 10·|∩| ≥ 9·|A|. One df window pass; plain doc-id joins re-attach
    // the arrays (no pinned broadcast — same posture as verifyJaccard).
    "llm_dedup_contain" -> ((s, dir) => {
      // r14: text shuffled, shingles computed post-exchange (same move
      // as llm_dedup_near — see the note there)
      val sh = graft.tools.Materialize.eager("dedup_contain.sh",
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text"))
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"), mkShingles(col("text")).as("sh"))
          .withColumn("n", size(col("sh"))))
      val ex = sh.select(col("doc_id"), col("n"), explode_outer(col("sh")).as("s"))
        .where(col("s").isNotNull)
      val wdf = Window.partitionBy("s")
      val w = Window.partitionBy("doc_id").orderBy(col("df").asc, col("s").asc)
      val withDf = graft.tools.Materialize.eager("dedup_contain.withDf",
        ex.withColumn("df", count(lit(1)).over(wdf))
          .withColumn("rk", row_number().over(w)))
      val pa = withDf
        .where(col("rk") <= col("n") - ceil(col("n") * lit(0.9)).cast("int") + 1)
        .select(col("doc_id").as("a_id"), col("s"))
      val pb = withDf.select(col("doc_id").as("b_id"), col("s"))
      val cand = pa.join(pb, "s")
        .where(col("a_id") =!= col("b_id"))
        .select("a_id", "b_id").distinct()
      graft.functions.TextShingles.verifyContainment(cand, sh, tenths = 9)
    }),

    // ---- explicitly salted skew-safe join -------------------------------
    // lineitem ⋈ supplier with the build side replicated over 8 salts and
    // the probe side salted by pmod(l_orderkey, 8): a hot supplier key
    // fans over 8 reducers instead of serializing into one. Decimal
    // partial sums make the two-stage result provably equal to the plain
    // join the oracle runs.
    "join_skew_salted" -> ((s, dir) => {
      val sup = Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_nationkey"))
        .withColumn("salt", explode(array((0 until 8).map(lit): _*)))
      val li = Tables.lineitem(s, dir)
        .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"),
          pmod(col("l_orderkey"), lit(8)).cast("int").as("salt"))
      li.join(sup,
          li("l_suppkey") === sup("s_suppkey") && li("salt") === sup("salt"))
        .groupBy("s_nationkey")
        .agg(
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("s_nationkey")
    }))

  val oracles: Map[String, String] = Map(
    "llm_sample_hash" ->
      """SELECT doc_id, lang, source,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
        |FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 10
        |ORDER BY doc_id""".stripMargin,

    "llm_sample_stratified" ->
      """WITH h AS (SELECT doc_id, lang,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
        |  FROM documents),
        |r AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rk
        |  FROM h)
        |SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 20 ORDER BY doc_id""".stripMargin,

    // The oracle mirrors the lossless rare-prefix candidate generation
    // instead of the r8 brute-force a×b self-join (r12 verdict item 2:
    // the O(n²) form exceeded the local DuckDB budget at 5,000 docs, so
    // sf0.1 full-surface parity had to fall back to residue slices).
    // Candidates = pairs sharing a gram in both docs' (df ASC, gram
    // ASC)-minimal prefixes of length n − ceil(0.7n) + 1 — lossless for
    // ANY fixed total gram order (the PPJoin prefix lemma), with the
    // same integer-exact length filter — then verified EXACTLY via
    // list_intersect on the full gram sets, so the result is
    // bit-identical to the brute-force form (validated: equal output at
    // sf0.001 + sf0.01; 0.5 s vs 43 s there, 4.6 s at sf0.1).
    "llm_dedup_ngram" ->
      """WITH g AS (SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, length(text) - 19),
        |                                 i -> substr(text, i, 20))) AS gr
        |  FROM documents WHERE length(text) >= 20),
        |n AS (SELECT doc_id, gr, len(gr) AS n FROM g),
        |ex AS (SELECT doc_id, n, unnest(gr) AS s FROM n),
        |dfc AS (SELECT doc_id, n, s, count(*) OVER (PARTITION BY s) AS df FROM ex),
        |rk AS (SELECT doc_id, n, s,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY df, s) AS rk
        |  FROM dfc),
        |pref AS (SELECT doc_id, n, s FROM rk
        |  WHERE rk <= n - CAST(ceil(n * 0.7) AS INT) + 1),
        |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM pref a JOIN pref b ON a.s = b.s
        |  WHERE a.doc_id < b.doc_id
        |    AND greatest(a.n, b.n) * 7 <= least(a.n, b.n) * 10),
        |p AS (SELECT a_id, b_id,
        |    len(list_intersect(ga.gr, gb.gr)) AS inter, ga.n AS na, gb.n AS nb
        |  FROM cand JOIN n ga ON ga.doc_id = a_id JOIN n gb ON gb.doc_id = b_id)
        |SELECT a_id AS doc_a, b_id AS doc_b,
        |  CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
        |FROM p WHERE inter * 10 >= (na + nb - inter) * 7
        |ORDER BY doc_a, doc_b""".stripMargin,

    "llm_dedup_contain" ->
      (graft.functions.TextShingles.duckShingleCte +
        """,
          |p AS (SELECT a.doc_id a_id, b.doc_id b_id,
          |        len(list_intersect(a.sh, b.sh)) inter, len(a.sh) na
          |      FROM s a JOIN s b ON a.doc_id <> b.doc_id)
          |SELECT a_id AS contained_id, b_id AS container_id,
          |  CAST(inter AS DOUBLE) / na AS containment
          |FROM p WHERE inter * 10 >= na * 9
          |ORDER BY contained_id, container_id""".stripMargin),

    "join_skew_salted" ->
      """SELECT s_nationkey,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey""".stripMargin)
}
