package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  test("FloatVecDot equals a left-fold of double products") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-10f, 10f))
    check(Prop.forAll(vecGen, vecGen) { (a: List[Float], b: List[Float]) =>
      val df = Seq((a.toArray, b.toArray)).toDF("a", "b")
      val got = df.select(vecDot(col("a"), col("b"))).head.getDouble(0)
      val want = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      got == want
    })
  }

  test("vecNorm is sqrt of self-dot; cosine of self is 1") {
    val v = Array(1f, 2f, 3f, 4f)
    val df = Seq((v, v)).toDF("a", "b")
    val n = df.select(vecNorm(col("a"))).head.getDouble(0)
    assert(n == math.sqrt(1.0 + 4.0 + 9.0 + 16.0))
    val cos = df.select(vecDot(col("a"), col("b")) / (vecNorm(col("a")) * vecNorm(col("b"))))
      .head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
  }

  test("SortedIntersectCount equals set-intersection size") {
    val tokens = Gen.listOf(Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg"))
    check(Prop.forAll(tokens, tokens) { (a: List[String], b: List[String]) =>
      val sa = a.distinct.sorted.toArray
      val sb = b.distinct.sorted.toArray
      val df = Seq((sa, sb)).toDF("a", "b")
      val got = df.select(sortedIntersectCount(col("a"), col("b"))).head.getInt(0)
      got == (sa.toSet & sb.toSet).size
    })
  }

  test("BigramArray: ordered, duplicate-keeping, empty-token-free bigrams") {
    import graft.functions.TextShingles.mkBigrams
    val df = Seq(
      "a b c a b",      // duplicate bigram "a b" must appear twice
      "  a   b  ",      // empty tokens from repeated spaces are dropped
      "solo",           // < 2 tokens -> empty array
      ""                // empty text -> empty array
    ).toDF("text").select(mkBigrams(col("text")).as("bg"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("a b", "b c", "c a", "a b"))
    assert(rows(1) == Seq("a b"))
    assert(rows(2).isEmpty && rows(3).isEmpty)
    // w1 recovery contract used by llm_bigram_score
    assert(rows(0).map(_.split(' ').head) == Seq("a", "b", "c", "a"))
  }

  test("ShingleArray + SortedIntersectCount agree with a set-reference on supplementary-plane text") {
    // The shingle kernel sorts in UTF-8 byte order specifically so the
    // merge pass in SortedIntersectCount (which compares UTF8Strings)
    // sees a consistent order even for characters outside the BMP,
    // where JVM String (UTF-16) order disagrees with UTF-8 order.
    import graft.functions.TextShingles.mkShingles
    import graft.functions.VectorFunctions.sortedIntersectCount
    // 𝕒 (U+1D552, supplementary) vs ﬃ (U+FB03, BMP): UTF-16 sorts the
    // surrogate-paired 𝕒 before ﬃ is FALSE in UTF-8 byte order
    val a = "x 𝕒 y ﬃ z w"
    val b = "y ﬃ z w 𝕒 x"
    def refShingles(t: String): Set[Seq[String]] =
      t.split(' ').filter(_.nonEmpty).sliding(3).map(_.toSeq).toSet
    val expected = (refShingles(a) & refShingles(b)).size
    val row = Seq((a, b)).toDF("ta", "tb")
      .select(sortedIntersectCount(
        mkShingles(col("ta")), mkShingles(col("tb"))).as("inter"))
      .collect()(0)
    assert(row.getInt(0) == expected,
      s"merge-pass intersection ${row.getInt(0)} != reference $expected")
  }

  test("join row-count algebra invariants at sf0.001 (property-style)") {
    val o = graft.sources.Tables.orders(spark, sf0001)
    val c = graft.sources.Tables.customer(spark, sf0001)
    val inner = o.join(c, o("o_custkey") === c("c_custkey")).count()
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi").count()
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti").count()
    assert(semi + anti == c.count())
    assert(semi <= c.count())
    assert(inner <= o.count() * c.count())
  }
}
