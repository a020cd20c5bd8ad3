package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions class must give a fresh session `minhash48` with no
  * explicit registration call. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions injects minhash48 into new sessions") {
    // getOrCreate returns any existing default session (which pre-dates
    // the extensions config) — clear first, restore after, so the
    // shared test session stays usable for other suites.
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions exercises the injector directly; the
      // `spark.sql.extensions=graft.plans.GraftExtensions` config path
      // uses the same class but only applies on a FRESH SparkContext
      // (static conf), which a shared test JVM cannot provide.
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = spark.sql("SELECT minhash48('the quick brown fox') AS sig")
        .head().getSeq[Long](0)
      assert(r.length == 8)
      assert(r.forall(_ != Long.MaxValue))
      // deterministic across invocations
      val r2 = spark.sql("SELECT minhash48('the quick brown fox') AS sig")
        .head().getSeq[Long](0)
      assert(r == r2)
      // the injection set tracks Functions.registerAll: every statically
      // injectable function resolves in pure SQL with no register call
      // (bpe_tokens is excluded by design — vocabulary-dependent)
      for (f <- Seq("dot64(array(1.0d), array(2.0d))",
          "simhash16('a b')", "simhash64('a b')", "xorfp48('a b')",
          "jaccard8('a b c d e f g h i', 'a b c d e f g h i')",
          "shingles8('a b c d e f g h i')", "gopher_stats('a b c')",
          "cov_moments(array(1.0d, 2.0d), 2)",
          "adc_sum(array(array(1.0d, 2.0d)), array(1L))"))
        assert(spark.sql(s"SELECT $f").head() != null, s"$f not injected")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      // Restore ACTIVE as well as default: parquet schema inference
      // consults SQLConf.get (thread-local active session) — leaving
      // active unset made later suites resolve nanos timestamps as
      // TIMESTAMP_NTZ (nanosAsLong lives in the shared session's conf),
      // an order-dependent flake.
      prior.foreach { s =>
        SparkSession.setDefaultSession(s)
        SparkSession.setActiveSession(s)
      }
    }
  }
}
