package graft

import org.scalatest.funsuite.AnyFunSuite

/** Double-run determinism gate: executing every declared query twice
  * must produce byte-identical rows — catches unsorted collects, ties
  * without tiebreaks, and map-ordering leaks before the driver's
  * hash-compare does.
  */
class DeterminismSpec extends AnyFunSuite {
  import TestSpark._

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name is run-to-run deterministic at sf0.001") {
      def snapshot(): Seq[String] =
        fn(spark, sf0001).collect().toSeq.map(_.toString)
      assert(snapshot() == snapshot())
    }
  }
}
