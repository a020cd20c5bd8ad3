package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pumle.SparkSpec

/** pq_encode must return EXACTLY what the interpreted HOF form it
  * replaced returns — `transform(sequence(0, m−1), s →
  * array_min(transform(cb[s], (cw, ci) → struct(fold, ci))).code)` —
  * including argmin ties (parallel duplicate codewords), NaN elements
  * (all-NaN subspace → code 0), null elements and short vectors
  * (nulls-first struct ordering → code 0), and null input rows. */
class PqEncodeSpec extends SparkSpec {

  private val dims = 8

  private def hofCodes(df: DataFrame,
      cbs: Seq[Seq[Seq[Double]]]): DataFrame = {
    val m = cbs.length
    val subDim = cbs.head.head.length
    df.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("cb", typedLit(cbs))
      .withColumn("codes", expr(
        s"""transform(sequence(0, ${m - 1}), s ->
          |  array_min(transform(element_at(cb, s + 1), (cw, ci) -> struct(
          |    aggregate(zip_with(slice(v, s * $subDim + 1, $subDim), cw,
          |      (a, b) -> (a - b) * (a - b)), CAST(0.0 AS DOUBLE), (acc, z) -> acc + z) AS dist2,
          |    ci AS code))).code)""".stripMargin))
      .select(col("vec_id"), col("codes"))
  }

  private def collectCodes(df: DataFrame): Seq[(Long, Seq[Int])] =
    df.collect().map(r => (r.getLong(0),
      Option(r.getSeq[Int](1)).map(_.toList).orNull))
      .sortBy(_._1).toSeq.map(t => (t._1, t._2))

  test("compiled encode ≡ the HOF form on random, tied, NaN, null and short rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val clean = (0 until 50).map(i =>
      (i.toLong, Array.fill(dims)((rnd.nextInt(200) - 100) / 50.0f)))
    val weird = Seq(
      (100L, Array.fill(dims)(Float.NaN)),                  // all-NaN
      (101L, { val v = Array.fill(dims)(0.1f); v(5) = Float.NaN; v }), // one NaN subspace
      (102L, Array.fill(dims)(0.0f)))                       // zeros
    val df = (clean ++ weird).toDF("vec_id", "embedding")
    // codebook WITH planted duplicate codewords (exact argmin ties)
    val base = graft.ext.Similarity.fixedCodebooks(m = 4, k = 6,
      subDim = dims / 4)
    val cbs = base.map(sub => sub.take(4) ++ Seq(sub(0), sub(1)))
    val got = collectCodes(graft.ext.Similarity.pqEncode(spark, df, cbs))
    val want = collectCodes(hofCodes(df, cbs))
    assert(got.nonEmpty)
    assert(got == want)
    // the planted duplicates mean ties exist: no code may ever pick the
    // LATER duplicate (4, 5) over its earlier twin (0, 1)
    assert(got.flatMap(_._2).forall(c => c < 4))
  }

  test("short vectors and null elements take code 0 in BOTH forms") {
    import spark.implicits._
    val short = Seq((200L, Array.fill(dims / 2)(0.3f)))
      .toDF("vec_id", "embedding")
    val cbs = graft.ext.Similarity.fixedCodebooks(m = 4, k = 6,
      subDim = dims / 4)
    val got = collectCodes(graft.ext.Similarity.pqEncode(spark, short, cbs))
    val want = collectCodes(hofCodes(short, cbs))
    assert(got == want)
    // subspaces 2..3 are out of range → 0
    assert(got.head._2.drop(2) == Seq(0, 0))
    // null element: build via SQL to plant a null inside the array
    val withNull = spark.sql(
      s"SELECT 201L AS vec_id, array(${Seq.fill(dims - 1)("CAST(0.2 AS FLOAT)").mkString(", ")}, CAST(NULL AS FLOAT)) AS embedding")
    val got2 = collectCodes(graft.ext.Similarity.pqEncode(spark, withNull, cbs))
    val want2 = collectCodes(hofCodes(withNull, cbs))
    assert(got2 == want2)
    assert(got2.head._2.last == 0)
  }

  test("null embedding row → NULL codes (deliberate divergence: the HOF form emitted garbage code 0s)") {
    import spark.implicits._
    val df = Seq((300L, null.asInstanceOf[Array[Float]]),
      (301L, Array.fill(dims)(0.5f))).toDF("vec_id", "embedding")
    val cbs = graft.ext.Similarity.fixedCodebooks(m = 4, k = 6,
      subDim = dims / 4)
    val got = collectCodes(graft.ext.Similarity.pqEncode(spark, df, cbs))
    // compiled: null in → null out (consumers skip the row — the
    // ivfAssign null-embedding discipline)
    assert(got.head._2 == null && got.last._2 != null)
    // the HOF form it replaced encoded the null row as all-zero codes —
    // an unsearchable-garbage candidate; pin the divergence so it is
    // a documented decision, not an accident
    val hof = collectCodes(hofCodes(df, cbs))
    assert(hof.head._2 == Seq(0, 0, 0, 0))
    // non-null rows are bit-identical between the forms
    assert(got.last == hof.last)
  }
}
