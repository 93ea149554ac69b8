package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.QueryUtils._
import graft.functions.AnnCodebook
import graft.functions.VectorFunctions.{dvecDot, vecDot, vecNorm}
import graft.sources.Tables

/** Round-9 fifth wave: embedding-quantization retrieval evals — how
  * much top-10 quality survives Matryoshka-style dimension truncation,
  * 1-bit sign quantization and int8 quantization — plus a per-dimension
  * sign-balance isotropy audit.
  *
  * Scale design: every exact side pairs the corpus only against the
  * deterministic 256-vector hash sample (pair volume 256·n, the
  * broadcast side constant — the llm_ann_recall10 regime); sign bits
  * pack into two 32-bit longs per VECTOR (not per pair) so the Hamming
  * ranking is two XOR+popcounts per candidate.
  *
  * Determinism: dots accumulate left-to-right in double via the
  * codegen'd FloatVecDot/DoubleVecDot (bit-identical to DuckDB's
  * list_aggregate fold); int8 codes are floor()-quantized integers
  * (floor, not engine-divergent double→int casts); recalls are emitted
  * as exact half-up 1e-4 integers (2-5-smooth denominators).
  */
object Round9eQueries {

  private def d(c: Column): Column = c.cast(DoubleType)

  /** Corpus with norms + the 256-query sample side (frame-parametric
    * so ScaleDryRun measures the shipped pipeline). */
  private[graft] def baseOf(raw: DataFrame): (DataFrame, DataFrame) = {
    val e = raw
      .select(col("vec_id"), col("embedding"), vecNorm(col("embedding")).as("nrm"))
    val aS = e.select(col("vec_id").as("a_id"), col("embedding").as("a_v"),
      col("nrm").as("a_n"))
      .join(broadcast(AnnCodebook.hashSample(e, 256)), Seq("a_id"))
    (e, aS)
  }

  private def base(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    baseOf(Tables.embeddings(s, dir))

  /** The dim-truncation overlap pipeline on an arbitrary corpus frame
    * (llm_ann_dim_truncate = this over Tables.embeddings). */
  private[graft] def truncOverlapOf(raw: DataFrame): DataFrame = {
    val (e, aS) = baseOf(raw)
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_v"),
      col("nrm").as("b_n"),
      vecNorm(slice(col("embedding"), 1, 32)).as("b_n32"))
    val pairs = b.crossJoin(broadcast(
        aS.withColumn("a_n32", vecNorm(slice(col("a_v"), 1, 32)))))
      .where(col("a_id") =!= col("b_id"))
    val ex10 = top10(pairs,
      vecDot(col("a_v"), col("b_v")) / (col("a_n") * col("b_n")))
    val tr10 = top10(pairs,
      vecDot(slice(col("a_v"), 1, 32), slice(col("b_v"), 1, 32))
        / (col("a_n32") * col("b_n32")))
    recallOf(ex10, tr10, "overlap_at_10")
  }

  private def top10(pairs: DataFrame, score: Column): DataFrame = pairs
    .withColumn("rk", row_number().over(Window.partitionBy("a_id")
      .orderBy(score.desc, col("b_id").asc)))
    .where(col("rk") <= 10).select("a_id", "b_id")

  /** hits of `approx` against `exact` (both (a_id, b_id) top-10 sets),
    * with recall/overlap as an exact half-up 1e-4 integer. */
  private def recallOf(exact: DataFrame, approx: DataFrame,
      outCol: String): DataFrame =
    exact.join(approx.withColumn("hit", lit(1L)), Seq("a_id", "b_id"), "left")
      .agg(countDistinct(col("a_id")).as("n_vecs"),
        count(lit(1)).as("n_pairs"), count(col("hit")).as("n_hits"))
      .select(col("n_vecs"), col("n_hits"),
        (expr("(2 * 10000 * n_hits + n_pairs) div (2 * n_pairs)")
          .cast(DoubleType) / 10000.0).as(outCol))

  /** The shared oracle prelude: double-cast embeddings with norms and
    * the 256-sample, and the exact full-dim cosine top-10. */
  private val baseSql =
    """n AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev,
      |    sqrt(list_aggregate(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm
      |  FROM embeddings),
      |smp AS (SELECT vec_id AS a_id FROM (
      |    SELECT vec_id, row_number() OVER (ORDER BY
      |      ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
      |      vec_id) AS rk
      |    FROM embeddings) WHERE rk <= 256),
      |asd AS (SELECT a_id, ev AS a_v, nrm AS a_n
      |  FROM n JOIN smp ON n.vec_id = smp.a_id),
      |p AS (SELECT a.a_id, b.vec_id AS b_id, a.a_v, b.ev AS b_v,
      |    a.a_n, b.nrm AS b_n,
      |    list_aggregate(list_transform(list_zip(a.a_v, b.ev),
      |      z -> z[1] * z[2]), 'sum') / (a.a_n * b.nrm) AS cos_full
      |  FROM asd a JOIN n b ON b.vec_id <> a.a_id),
      |ex10 AS (SELECT a_id, b_id FROM (
      |    SELECT a_id, b_id, row_number() OVER (PARTITION BY a_id
      |      ORDER BY cos_full DESC, b_id ASC) AS rk FROM p)
      |  WHERE rk <= 10)""".stripMargin

  private val recallSql =
    """SELECT CAST(count(DISTINCT a_id) AS BIGINT) AS n_vecs,
      |  CAST(count(hit) AS BIGINT) AS n_hits,
      |  CAST((2 * 10000 * count(hit) + count(*)) // (2 * count(*))
      |    AS DOUBLE) / 10000.0 AS %s
      |FROM ex10 LEFT JOIN ap10 USING (a_id, b_id)""".stripMargin

  val queries: Map[String, QFn] = Map(

    // ---- Matryoshka dimension-truncation overlap ---------------------------------
    // Top-10 by cosine over the FIRST 32 of 64 dims vs the full-dim
    // exact top-10 — the truncate-don't-retrain retrieval eval. Both
    // rankings run over the same 256·n pair set.
    "llm_ann_dim_truncate" -> ((s, dir) =>
      truncOverlapOf(Tables.embeddings(s, dir))),

    // ---- 1-bit sign-quantization recall -------------------------------------------
    // Candidates ranked by Hamming distance of the 64 sign bits
    // (packed per vector into two 32-bit longs; two XOR+popcounts per
    // pair) vs the exact cosine top-10.
    "llm_emb_binary_recall" -> ((s, dir) => {
      val (e0, aS0) = base(s, dir)
      def packBits(vName: String, off: Int): Column = expr(
        s"aggregate(zip_with(slice($vName, ${off + 1}, 32), " +
          "sequence(0, 31), (x, i) -> IF(x > 0, shiftleft(1L, i), 0L)), " +
          "0L, (acc, v) -> acc + v)")
      val e = e0.select(col("vec_id").as("b_id"), col("embedding").as("b_v"),
        col("nrm").as("b_n"),
        packBits("embedding", 0).as("b_lo"),
        packBits("embedding", 32).as("b_hi"))
      val aS = aS0
        .withColumn("a_lo", packBits("a_v", 0))
        .withColumn("a_hi", packBits("a_v", 32))
      val pairs = e.crossJoin(broadcast(aS))
        .where(col("a_id") =!= col("b_id"))
      val ex10 = top10(pairs,
        vecDot(col("a_v"), col("b_v")) / (col("a_n") * col("b_n")))
      val bin10 = pairs
        .withColumn("hd",
          bit_count(col("a_lo").bitwiseXOR(col("b_lo")))
            + bit_count(col("a_hi").bitwiseXOR(col("b_hi"))))
        .withColumn("rk", row_number().over(Window.partitionBy("a_id")
          .orderBy(col("hd").asc, col("b_id").asc)))
        .where(col("rk") <= 10).select("a_id", "b_id")
      recallOf(ex10, bin10, "recall_at_10")
    }),

    // ---- int8 symmetric-quantization recall ----------------------------------------
    // Per-vector codes qᵢ = floor(127·xᵢ/max|x|); candidates ranked by
    // the cosine of the integer code vectors vs the exact float top-10.
    "llm_emb_int8_recall" -> ((s, dir) => {
      val (e0, aS0) = base(s, dir)
      def q8(v: Column): Column = {
        val mx = array_max(transform(v, x => abs(x)))
        transform(v, x => floor(x.cast(DoubleType) * lit(127.0)
          / mx.cast(DoubleType)))
      }
      val e = e0.select(col("vec_id").as("b_id"), col("embedding").as("b_v"),
        col("nrm").as("b_n"), q8(col("embedding")).as("b_q"))
        .withColumn("b_qn", sqrt(dvecDot(col("b_q"), col("b_q"))))
      val aS = aS0.withColumn("a_q", q8(col("a_v")))
        .withColumn("a_qn", sqrt(dvecDot(col("a_q"), col("a_q"))))
      val pairs = e.crossJoin(broadcast(aS))
        .where(col("a_id") =!= col("b_id"))
      val ex10 = top10(pairs,
        vecDot(col("a_v"), col("b_v")) / (col("a_n") * col("b_n")))
      val q10 = top10(pairs,
        dvecDot(col("a_q"), col("b_q")) / (col("a_qn") * col("b_qn")))
      recallOf(ex10, q10, "recall_at_10")
    }),

    // ---- per-dimension sign balance ------------------------------------------------
    // Share of vectors with a positive coordinate, per dimension — the
    // isotropy audit beside llm_emb_dim_variance (a mean-shifted
    // dimension shows up as a lopsided sign split). 64 rows.
    "llm_emb_sign_balance" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("dim").cast("long").as("dim"))
        .agg(count(lit(1)).as("n"),
          count_if(col("x") > lit(0.0f)).as("n_pos"))
        .select(col("dim"), col("n"), col("n_pos"),
          round(d(col("n_pos")) / d(col("n")), 6).as("pos_share"))
        .orderBy("dim")))

  // ---- DuckDB oracles ----------------------------------------------------

  val oracles: Map[String, String] = Map(

    "llm_ann_dim_truncate" -> s"""
      |WITH $baseSql,
      |t AS (SELECT a_id, b_id,
      |    list_aggregate(list_transform(list_zip(a_v[1:32], b_v[1:32]),
      |      z -> z[1] * z[2]), 'sum')
      |    / (sqrt(list_aggregate(list_transform(a_v[1:32],
      |        x -> x * x), 'sum'))
      |      * sqrt(list_aggregate(list_transform(b_v[1:32],
      |        x -> x * x), 'sum'))) AS cos32
      |  FROM p),
      |ap10 AS (SELECT a_id, b_id, 1 AS hit FROM (
      |    SELECT a_id, b_id, row_number() OVER (PARTITION BY a_id
      |      ORDER BY cos32 DESC, b_id ASC) AS rk FROM t)
      |  WHERE rk <= 10)
      |${recallSql.format("overlap_at_10")}""".stripMargin,

    "llm_emb_binary_recall" -> s"""
      |WITH $baseSql,
      |bits AS (SELECT vec_id,
      |    CAST(list_aggregate(list_transform(range(1, 33),
      |      i -> CASE WHEN ev[i] > 0 THEN (1::BIGINT << (i - 1))
      |        ELSE 0 END), 'sum') AS BIGINT) AS lo,
      |    CAST(list_aggregate(list_transform(range(33, 65),
      |      i -> CASE WHEN ev[i] > 0 THEN (1::BIGINT << (i - 33))
      |        ELSE 0 END), 'sum') AS BIGINT) AS hi
      |  FROM n),
      |h AS (SELECT p.a_id, p.b_id,
      |    bit_count(xor(ba.lo, bb.lo)) + bit_count(xor(ba.hi, bb.hi)) AS hd
      |  FROM p JOIN bits ba ON ba.vec_id = p.a_id
      |    JOIN bits bb ON bb.vec_id = p.b_id),
      |ap10 AS (SELECT a_id, b_id, 1 AS hit FROM (
      |    SELECT a_id, b_id, row_number() OVER (PARTITION BY a_id
      |      ORDER BY hd ASC, b_id ASC) AS rk FROM h)
      |  WHERE rk <= 10)
      |${recallSql.format("recall_at_10")}""".stripMargin,

    "llm_emb_int8_recall" -> s"""
      |WITH $baseSql,
      |q AS (SELECT vec_id,
      |    list_transform(ev, x -> CAST(floor(x * 127.0
      |      / list_max(list_transform(ev, y -> abs(y)))) AS BIGINT)) AS qv
      |  FROM n),
      |qn AS (SELECT vec_id, qv,
      |    sqrt(CAST(list_aggregate(list_transform(qv, x -> x * x),
      |      'sum') AS DOUBLE)) AS qnrm
      |  FROM q),
      |c AS (SELECT p.a_id, p.b_id,
      |    CAST(list_aggregate(list_transform(list_zip(qa.qv, qb.qv),
      |      z -> z[1] * z[2]), 'sum') AS DOUBLE) / (qa.qnrm * qb.qnrm)
      |      AS cq
      |  FROM p JOIN qn qa ON qa.vec_id = p.a_id
      |    JOIN qn qb ON qb.vec_id = p.b_id),
      |ap10 AS (SELECT a_id, b_id, 1 AS hit FROM (
      |    SELECT a_id, b_id, row_number() OVER (PARTITION BY a_id
      |      ORDER BY cq DESC, b_id ASC) AS rk FROM c)
      |  WHERE rk <= 10)
      |${recallSql.format("recall_at_10")}""".stripMargin,

    "llm_emb_sign_balance" -> """
      |SELECT CAST(i - 1 AS BIGINT) AS dim,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(*) FILTER (embedding[CAST(i AS INTEGER)] > 0)
      |    AS BIGINT) AS n_pos,
      |  round(CAST(count(*) FILTER (embedding[CAST(i AS INTEGER)] > 0)
      |      AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE), 6) AS pos_share
      |FROM embeddings, range(1, 65) r(i)
      |GROUP BY i ORDER BY dim""".stripMargin)
}
