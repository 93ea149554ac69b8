package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 thirteenth-wave anchors at sf0.001. */
class Round9mSpec extends AnyFunSuite {
  import TestSpark._

  test("source_csv_quoted roundtrips hostile strings losslessly") {
    val exp = graft.sources.Tables.part(spark, sf0001)
      .select(col("p_partkey"),
        concat(col("p_name"), lit(", \""), col("p_brand"), lit("\"\nL2"))
          .as("tricky"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = SparkEntry.queries("source_csv_quoted")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == exp)
    assert(got.values.forall(v => v.contains("\n") && v.contains("\"")
      && v.contains(",")), "the hostile characters actually survive")
  }

  test("win_ichimoku midpoints bracket the rolling extremes") {
    val rows = SparkEntry.queries("win_ichimoku")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (tk, kj) = (r.getDouble(2), r.getDouble(3))
      assert(!r.isNullAt(4), "senkou defined for all emitted rows")
      // the 17-day window contains the 9-day one, so kijun's extremes
      // bracket tenkan's midpoint relations are loose; both positive
      assert(tk > 0 && kj > 0)
    }
    // chikou is null exactly on the last 8 rows of each type
    val byType = rows.groupBy(_.getString(0))
    for ((t, rs) <- byType) {
      val sorted = rs.sortBy(_.getLong(1))
      val nNull = sorted.count(_.isNullAt(5))
      assert(nNull == math.min(8, sorted.length), s"$t chikou tail")
      assert(sorted.takeRight(nNull).forall(_.isNullAt(5)), s"$t tail only")
    }
  }

  test("agg_srm_check replays the exact chi-square at sf0.001") {
    val row = SparkEntry.queries("agg_srm_check")(spark, sf0001)
      .collect().head
    val (n, nt, nv, ns) = (row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3))
    assert(nt + nv + ns == n)
    val d90 = BigInt(100 * nt - 90 * n)
    val d5v = BigInt(100 * nv - 5 * n)
    val d5t = BigInt(100 * ns - 5 * n)
    val num = d90 * d90 + 18 * d5v * d5v + 18 * d5t * d5t
    val chi6 = (2 * 1000000 * num + 9000 * n) / (2 * 9000 * BigInt(n))
    assert(row.getDouble(4) == chi6.toDouble / 1e6)
    // a healthy md5 split is far from SRM alarm at this n
    assert(row.getDouble(4) >= 0.0)
  }

  test("gen_posexplode_outer keeps NULL-array rows at sf0.001") {
    val parts = graft.sources.Tables.part(spark, sf0001)
      .select(col("p_partkey"), col("p_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" "))
    val got = SparkEntry.queries("gen_posexplode_outer")(spark, sf0001)
      .collect()
    val byKey = got.groupBy(_.getLong(0))
    for ((pk, name) <- parts) {
      if (name.length >= 4) {
        val rs = byKey(pk).sortBy(_.getLong(1))
        assert(rs.length == name.length, s"part $pk token count")
        assert(rs.map(_.getString(2)).sameElements(name), s"part $pk tokens")
      } else {
        val rs = byKey(pk)
        assert(rs.length == 1 && rs.head.isNullAt(1) && rs.head.isNullAt(2),
          s"part $pk NULL row")
      }
    }
  }
}
