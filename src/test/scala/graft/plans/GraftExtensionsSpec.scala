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

  test("DotProductRewrite: HOF dot-product idiom compiles to dot64, semantics intact") {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-rewrite-test")
        .withExtensions(new GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val hof = "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
      def q(sql: String) = spark.sql(sql)
      // RUNTIME arrays (derived from the range attribute) — literal
      // arrays would be constant-folded before the user-rule batch and
      // the rewrite would have nothing to do (correctly so)
      spark.range(4).selectExpr(
        """CASE WHEN id = 0 THEN array(1.0D, 2.0D, 3.0D)
          |     WHEN id = 1 THEN array(1.0D, 2.0D)
          |     WHEN id = 2 THEN array(1.0D, CAST(NULL AS DOUBLE))
          |     ELSE CAST(NULL AS ARRAY<DOUBLE>) END AS a""".stripMargin,
        """CASE WHEN id = 0 THEN array(4.0D, 5.0D, 6.0D)
          |     WHEN id = 1 THEN array(1.0D)
          |     ELSE array(1.0D, 2.0D) END AS b""".stripMargin,
        "id").createOrReplaceTempView("vecs")

      // the rewrite fires: optimized plan carries dot64, not the HOF
      val df = q(s"SELECT id, $hof AS d FROM vecs ORDER BY id")
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("dot64"), s"rewrite did not fire:\n$opt")
      assert(!opt.contains("aggregate("), opt)
      val rows = df.collect()
      assert(rows(0).getDouble(1) == 32.0)
      // NULL contract preserved through the rewrite: length mismatch,
      // null element, null array
      assert(rows(1).isNullAt(1), "length mismatch must stay NULL")
      assert(rows(2).isNullAt(1), "null element must stay NULL")
      assert(rows(3).isNullAt(1), "null array must stay NULL")

      // commuted operands match too (IEEE * and + are commutative)
      val com = q("SELECT aggregate(zip_with(a, b, (x, y) -> y * x), 0D, " +
        "(acc, z) -> z + acc) AS d FROM vecs WHERE id = 0")
      assert(com.queryExecution.optimizedPlan.toString.contains("dot64"))
      assert(com.head().getDouble(0) == 32.0)

      // non-matching shapes are left alone: nonzero seed, non-product lambda
      for (sql <- Seq(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 1.0D, (acc, z) -> acc + z)",
        "aggregate(zip_with(a, b, (x, y) -> x + y), 0D, (acc, z) -> acc + z)")) {
        val p = q(s"SELECT $sql AS d FROM vecs WHERE id = 0")
        assert(!p.queryExecution.optimizedPlan.toString.contains("dot64"),
          s"must not rewrite: $sql")
      }
      // and the non-matching seed still evaluates correctly (1 + dot)
      assert(q("SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 1.0D, " +
        "(acc, z) -> acc + z) AS d FROM vecs WHERE id = 0")
        .head().getDouble(0) == 33.0)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach { s =>
        SparkSession.setDefaultSession(s)
        SparkSession.setActiveSession(s)
      }
    }
  }
}
