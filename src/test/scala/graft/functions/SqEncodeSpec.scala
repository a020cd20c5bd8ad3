package graft.functions

import org.apache.spark.sql.functions._

import graft.pumle.SparkSpec

/** sq_encode must be bit-identical to the interpreted
  * transform/element_at CASE form it replaced — q132's oracle replays
  * that exact arithmetic (clamps, constant-dimension zero, floor +0.5
  * midpoint) in DuckDB. */
class SqEncodeSpec extends SparkSpec {

  private val dims = 8
  // a model with: a constant dimension (mx = mn), a NARROW range so
  // data clamps on both sides, and ordinary ranges
  private val mins = Array(-1.0, 0.0, 0.25, -0.5, 0.0, -2.0, 1.0, -1.0)
  private val maxs = Array(1.0, 0.0, 0.35, 0.5, 1e-9, 2.0, 3.0, -0.25)

  private def interpreted(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("qmn", typedLit(mins.toIndexedSeq))
    .withColumn("qmx", typedLit(maxs.toIndexedSeq))
    .withColumn("codes", expr(
      s"""transform(sequence(1, $dims), d ->
         |  CASE WHEN element_at(qmx, d) = element_at(qmn, d) THEN 0L
         |  ELSE CAST(least(greatest(
         |    floor((element_at(v, d) - element_at(qmn, d))
         |      / (element_at(qmx, d) - element_at(qmn, d)) * 255.0 + 0.5),
         |    0.0D), 255.0D) AS BIGINT) END)""".stripMargin))
    .select(col("vec_id"), col("codes"))

  test("sq_encode equals the interpreted transform/CASE form, clamps included") {
    import spark.implicits._
    SqEncode.register(spark, new SqModelRef(mins, maxs))
    val df = Seq.tabulate(500) { i =>
      (i.toLong, Array.tabulate(dims)(d =>
        // values straddling [mn, mx] on every dimension, plus exact
        // endpoints and floor midpoints
        mins(d) + (maxs(d) - mins(d)) * ((i * (d + 7) % 31) - 5) / 20.0))
    }.toDF("vec_id", "v")
    val fast = df.selectExpr("vec_id", "sq_encode(v) AS codes")
      .collect().map(r => (r.getLong(0), r.getSeq[java.lang.Long](1))).toSeq
    val slow = interpreted(df)
      .collect().map(r => (r.getLong(0), r.getSeq[java.lang.Long](1))).toSeq
    assert(fast.sortBy(_._1) == slow.sortBy(_._1))
    // clamps actually exercised: some 0s and 255s beyond the constant dim
    val all = fast.flatMap(_._2.map(_.longValue))
    assert(all.contains(0L) && all.contains(255L))
  }

  test("sq_encode: null elements encode to 0 (greatest/least null-skipping)") {
    import spark.implicits._
    SqEncode.register(spark, new SqModelRef(mins, maxs))
    // null on BOTH the constant dimension (1: CASE short-circuits to
    // 0 before touching the element) and a ranged one (2: the null
    // reaches greatest(NULL, 0.0), which SKIPS nulls → clamps to 0)
    val df = Seq((1L, Seq[java.lang.Double](0.5, null, null, 0.0, 0.0, 1.0, 2.0, -0.5)))
      .toDF("vec_id", "v")
    val fast = df.selectExpr("sq_encode(v) AS codes")
      .collect().map(_.getSeq[java.lang.Long](0)).head
    val slow = interpreted(df.selectExpr("vec_id", "v"))
      .collect().map(_.getSeq[java.lang.Long](1)).head
    assert(fast == slow)
    assert(fast(1) == 0L, "constant dim short-circuits to 0 over null")
    assert(fast(2) == 0L, "ranged-dim null clamps to 0 via greatest")
    assert(fast(0) == 191L)
  }
}
