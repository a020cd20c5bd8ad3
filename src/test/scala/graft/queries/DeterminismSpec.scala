package graft.queries

import graft.pumle.SparkSpec

/** Registry-wide determinism gate: every query, run twice at sf0.001,
  * must produce IDENTICAL rows in IDENTICAL order. The driver's
  * correctness compare hashes typed cell values — a tie broken
  * differently across runs (an orderBy missing a unique key, an
  * unstable limit, wall-clock leakage) passes once and flakes forever.
  * This catches that class before the driver does. */
class DeterminismSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every registered query is run-to-run deterministic at sf0.001") {
    val flaky = Registry.all.flatMap { q =>
      def fingerprint(): Seq[String] =
        q.fn(spark, sf).collect().map(_.mkString("")).toSeq
      val a = fingerprint()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      val b = fingerprint()
      if (a == b) None
      else Some(s"${q.name}: run1 ${a.length} rows, run2 ${b.length} rows, " +
        s"first diff at ${a.zip(b).indexWhere { case (x, y) => x != y }}")
    }
    assert(flaky.isEmpty, flaky.mkString("; "))
  }
}
