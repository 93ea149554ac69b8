package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-derived anchors for the round-6 sixth-wave batch. */
class Round6fSpec extends AnyFunSuite {
  import TestSpark._

  test("llm_sketch_cms: estimates never undercount and match truth for heavy hitters") {
    val rows = SparkEntry.queries("llm_sketch_cms")(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    for (r <- rows) {
      val t = r.getLong(1); val est = r.getLong(2); val over = r.getLong(3)
      assert(est >= t, s"${r.getString(0)}: CMS must never undercount ($est < $t)")
      assert(over == est - t)
    }
    // the grid holds the FULL corpus mass: each depth row sums to it, so
    // an estimate can never exceed the total token count
    val total = sources.Tables.documents(spark, sf0001)
      .select(QueryUtils.nTok.as("nt")).agg(sum("nt")).collect()(0).getLong(0)
    assert(rows.forall(_.getLong(2) <= total))
  }

  test("graph_modularity: Q within [-0.5, 1]; internal edges bounded by m") {
    val rows = SparkEntry.queries("graph_modularity")(spark, sf0001).collect()
    assert(rows.length == 1)
    val r = rows.head
    val m = r.getLong(0); val internal = r.getLong(2); val q = r.getDouble(3)
    assert(m > 0 && internal >= 0 && internal <= m)
    assert(q >= -0.5 - 1e-6 && q <= 1.0 + 1e-6, s"Q=$q")
  }

  test("agg_growth_accounting: states partition week+1 actives; new+resurrected = arrivals") {
    val rows = SparkEntry.queries("agg_growth_accounting")(spark, sf0001)
      .collect().sortBy(_.getInt(0))
    assert(rows.nonEmpty)
    // independent per-week active counts
    val uw = sources.Tables.events(spark, sf0001)
      .select(col("user_id").as("u"),
        ((dayofmonth(col("ts")) - 1) / 7).cast("int").as("wk"))
      .distinct().collect().map(r => (r.getLong(0), r.getInt(1)))
    val byWeek = uw.groupBy(_._2).map { case (w, xs) => (w, xs.map(_._1).toSet) }
    for (r <- rows) {
      val w = r.getInt(0)
      val cur = byWeek.getOrElse(w, Set.empty[Long])
      val nxt = byWeek.getOrElse(w + 1, Set.empty[Long])
      assert(r.getLong(1) == (cur & nxt).size, s"week $w retained")
      assert(r.getLong(2) == (cur -- nxt).size, s"week $w churned")
      assert(r.getLong(3) + r.getLong(4) == (nxt -- cur).size,
        s"week $w arrivals split")
    }
  }
}
