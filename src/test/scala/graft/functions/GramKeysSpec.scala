package graft.functions

import org.apache.spark.sql.functions._

import graft.pumle.SparkSpec

/** gram_keys must preserve the string-gram equivalence relation the
  * q125 oracle replays: two (rung, start) grams are hash-equal iff
  * their `array_join(slice(ws, i+1, n), ' ')` strings are equal — the
  * whole contamLadder contract (shared counts vs a DuckDB string
  * replay) rides on that. */
class GramKeysSpec extends SparkSpec {

  private val sizes = Seq(2, 3, 5)

  private def randomDocs(n: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    // small vocab → heavy genuine gram collisions across docs, plus
    // short docs (clipping) and an empty doc
    (0 until n).map { i =>
      val words = (0 until rnd.nextInt(12)).map(_ => s"w${rnd.nextInt(7)}")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  /** The interpreted string generator contamLadder replaced — kept
    * here verbatim as the reference semantics. */
  private def stringGrams(df: org.apache.spark.sql.DataFrame) = {
    val gen = sizes.map(n =>
      s"""transform(sequence(0, least(greatest(size(ws) - $n, 0), 4096)),
         |  i -> named_struct('n', $n,
         |    'g', array_join(slice(ws, i + 1, $n), ' ')))""".stripMargin)
      .mkString("concat(", ", ", ")")
    df.withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), posexplode(expr(gen)).as(Seq("pos", "t")))
      .select(col("doc_id"), col("pos"), col("t.n").as("n"),
        col("t.g").as("g"))
  }

  private def hashGrams(df: org.apache.spark.sql.DataFrame) = {
    GramKeys.register(spark, sizes)
    df.select(col("doc_id"), posexplode(expr("gram_keys(text)"))
        .as(Seq("pos", "t")))
      .select(col("doc_id"), col("pos"), col("t.n").as("n"),
        col("t.h").as("h"))
  }

  test("hash-equal iff string-equal, same enumeration order and count") {
    val docs = randomDocs(120, seed = 11)
    val joined = stringGrams(docs).join(hashGrams(docs),
        Seq("doc_id", "pos", "n")).cache()
    // same (doc, pos) enumeration on both sides — inner join loses nothing
    assert(joined.count() == stringGrams(docs).count())
    // the equivalence relation is IDENTICAL: every string class maps to
    // exactly one hash class and vice versa, per rung
    val classes = joined.groupBy(col("n"), col("g"))
      .agg(countDistinct(col("h")).as("nh")).collect()
    assert(classes.forall(_.getAs[Long]("nh") == 1L), "string class split")
    val back = joined.groupBy(col("n"), col("h"))
      .agg(countDistinct(col("g")).as("ng")).collect()
    assert(back.forall(_.getAs[Long]("ng") == 1L), "hash collision")
    joined.unpersist()
  }

  test("short-doc clipping and empty text follow the shared convention") {
    import spark.implicits._
    GramKeys.register(spark, sizes)
    // empty text → split gives [""] → every rung emits its single
    // clipped gram at start 0
    val r = Seq((1L, ""), (2L, "a"), (3L, "a b c d e f"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), size(expr("gram_keys(text)")).as("k"))
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    // doc len L: count per rung n = min(max(L-n,0),4096)+1
    def expected(l: Int) = sizes.map(n => math.min(math.max(l - n, 0), 4096) + 1).sum
    assert(r(1L) == expected(1)) // [""] has length 1
    assert(r(2L) == expected(1))
    assert(r(3L) == expected(6))
  }

  test("null text yields null (explode drops the row)") {
    import spark.implicits._
    GramKeys.register(spark, sizes)
    val out = Seq((1L, Option.empty[String]), (2L, Some("a b c")))
      .toDF("doc_id", "text")
      .select(col("doc_id"), explode(expr("gram_keys(text)")).as("t"))
      .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(out == Set(2L))
  }

  test("contamLadder over the compiled generator matches a string-join replay") {
    import spark.implicits._
    val docs = randomDocs(150, seed = 23)
    val evalPred = col("doc_id") % 9 === 0
    val got = graft.ext.TextStats.contamLadder(docs, evalPred, sizes)
      .orderBy(col("doc_id")).collect()
    // string-side replay of the identical relational shape
    val g = stringGrams(docs)
      .join(docs.select(col("doc_id"), evalPred.as("is_eval")), "doc_id")
    val evalSet = g.filter(col("is_eval")).select(col("n"), col("g")).distinct()
    val sharedCols = sizes.map(n =>
      sum(when(col("n") === n, 1L).otherwise(0L)).as(s"shared$n"))
    val shared = g.filter(!col("is_eval"))
      .join(evalSet, Seq("n", "g"), "left_semi")
      .groupBy(col("doc_id")).agg(sharedCols.head, sharedCols.tail: _*)
    val want = docs.filter(!evalPred).select(col("doc_id"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id") +: sizes.map(n =>
        coalesce(col(s"shared$n"), lit(0L)).as(s"shared$n")): _*)
      .orderBy(col("doc_id")).collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (a, b) =>
      assert(a.getAs[Long]("doc_id") == b.getAs[Long]("doc_id"))
      sizes.foreach(n =>
        assert(a.getAs[Long](s"shared$n") == b.getAs[Long](s"shared$n"),
          s"doc ${a.getAs[Long]("doc_id")} rung $n"))
    }
  }
}
