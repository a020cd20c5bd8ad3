package graft.ext

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.pumle.SparkSpec

/** The narrow (per-row) quality gate must be bit-identical to the
  * relational one, shuffle-free, and must stream. */
class NarrowGateSpec extends SparkSpec {

  private def randomDocs(n: Int, seed: Long, vocab: Int, len: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(len))("w" + rnd.nextInt(vocab)).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("gopherFilterNarrow == gopherFilter on random corpora (all columns)") {
    for ((vocab, len, seed) <- Seq((8, 60, 1L), (40, 25, 2L), (3, 10, 3L))) {
      val docs = randomDocs(50, seed, vocab, len)
      val cols = Seq("doc_id", "n_words", "dup_word_frac",
        "top_bigram_frac", "entropy", "reason_mask", "keep")
      val rel = TextStats.gopherFilter(docs)
        .select(cols.map(col): _*).orderBy("doc_id").collect()
      val nar = TextStats.gopherFilterNarrow(docs)
        .select(cols.map(col): _*).orderBy("doc_id").collect()
      assert(rel.length == nar.length)
      rel.zip(nar).foreach { case (a, b) =>
        assert(a == b, s"vocab=$vocab len=$len: relational $a != narrow $b")
      }
    }
  }

  test("gopherFilterNarrow plan is fully narrow: no exchange, no aggregate, no generate") {
    val docs = randomDocs(10, seed = 4, vocab = 10, len = 20)
    val p = TextStats.gopherFilterNarrow(docs).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("HashAggregate"), p)
    assert(!p.contains("Generate"), p)
    // (no gopher_stats assert here: on a local Seq-backed frame
    // ConvertToLocalRelation folds the whole gate at plan time —
    // itself proof the expression evaluates eagerly; PlanSpec pins the
    // call's presence + single evaluation on the parquet-backed q96)
  }

  test("streaming qualityGate: verdicts match the batch gate, duplicates dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val mkTs = (m: Int) => new java.sql.Timestamp(t0.getTime + m * 60000L)
    val texts = randomDocs(12, seed = 7, vocab = 8, len = 50)
      .collect().map(r => (r.getLong(0), r.getString(1)))

    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    // batch 1: docs 0-7; batch 2: docs 8-11 plus a re-send of doc 0's
    // text under a new id (content dup — must NOT emit again)
    in.addData(texts.take(8).map { case (id, t) => (id, t, mkTs(id.toInt)) }.toSeq)
    val out = graft.streaming.Streams.qualityGate(
      in.toDF.toDF("doc_id", "text", "ts"))
    val q = out.writeStream.format("memory").queryName("gate_out")
      .outputMode("append").start()
    q.processAllAvailable()
    in.addData(texts.drop(8).map { case (id, t) => (id, t, mkTs(id.toInt)) }.toSeq
      :+ ((99L, texts.head._2, mkTs(13))))
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT * FROM gate_out").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("reason_mask"), r.getAs[Boolean]("keep"))).toMap
    assert(got.size == 12, s"expected 12 unique docs, got ${got.keySet}")
    assert(!got.contains(99L), "content duplicate re-emitted")

    val batch = TextStats.gopherFilter(texts.toSeq.toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("reason_mask"), r.getAs[Boolean]("keep"))).toMap
    got.foreach { case (id, v) =>
      assert(batch(id) == v, s"doc $id: stream $v != batch ${batch(id)}")
    }
  }
}
