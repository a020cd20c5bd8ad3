package graft.ext

import org.apache.spark.sql.functions._

import graft.pumle.SparkSpec

/** Invariant ("property-style") checks for the corpus operators, over
  * seeded random corpora — the laws that must hold for ANY input, as
  * opposed to ExtApiSpec's pinned examples. */
class ExtInvariantSpec extends SparkSpec {

  private def randomDocs(n: Int, seed: Long, vocab: Int = 40, len: Int = 25) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(len))("w" + rnd.nextInt(vocab)).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("scrubPii is idempotent: scrubbing cleaned text finds nothing") {
    val docs = randomDocs(40, seed = 7).withColumn("text",
      concat(col("text"), lit(" mail bob"), col("doc_id"), lit("@x.org tel +1 555-010-"),
        lpad(col("doc_id").cast("string"), 4, "0")))
    val once = TextStats.scrubPii(docs).select(col("doc_id"), col("cleaned").as("text"))
    val twice = TextStats.scrubPii(once).orderBy("doc_id").collect()
    assert(twice.forall(r => r.getAs[Long]("n_emails") == 0L
      && r.getAs[Long]("n_phones") == 0L))
    val onceMap = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(twice.forall(r => r.getAs[String]("cleaned") == onceMap(r.getLong(0))))
  }

  test("dedupChunks with an infinite cap is the identity on every text") {
    for (k <- Seq(1, 2, 3, 7)) {
      val docs = randomDocs(30, seed = 11 + k)
      val out = Dedup.dedupChunks(docs, chunkWords = k, maxReps = Int.MaxValue)
        .select(col("doc_id"), col("kept_text"))
        .join(docs, Seq("doc_id"))
        .filter(col("kept_text") =!= col("text"))
      assert(out.count() == 0, s"chunkWords=$k not identity")
    }
  }

  test("dedupChunks conserves chunk counts: kept words + dropped chunks account for the text") {
    val docs = randomDocs(30, seed = 13, vocab = 6) // tiny vocab → real repeats
    val out = Dedup.dedupChunks(docs, chunkWords = 2, maxReps = 3)
      .join(docs, Seq("doc_id"))
      .withColumn("n_words", size(split(col("text"), " ")).cast("long"))
      .withColumn("kept_words",
        when(col("kept_text") === "", lit(0L))
          .otherwise(size(split(col("kept_text"), " ")).cast("long")))
      .collect()
    out.foreach { r =>
      val (nw, kw, nc, dc) = (r.getAs[Long]("n_words"), r.getAs[Long]("kept_words"),
        r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dropped_chunks"))
      assert(nc == (nw + 1) / 2, s"chunk count wrong: $r")
      // dropped chunks have 2 words each except a possibly-odd last chunk
      assert(kw >= nw - 2 * dc && kw <= nw - dc, s"word accounting wrong: $r")
    }
  }

  test("decontaminate: an exact copy of an eval doc is always contaminated") {
    import spark.implicits._
    val base = randomDocs(20, seed = 17, vocab = 200, len = 12)
    val evalDocs = base.filter(col("doc_id") < 5)
    // training docs 100.. are copies of eval docs 0..4; 200.. are fresh
    val copies = evalDocs.select((col("doc_id") + 100).as("doc_id"), col("text"))
    val fresh = randomDocs(5, seed = 99, vocab = 200, len = 12)
      .select((col("doc_id") + 200).as("doc_id"), col("text"))
    val all = evalDocs.unionAll(copies).unionAll(fresh)
    val out = TextStats.decontaminate(all, col("doc_id") < 5)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("contaminated")).toMap
    (100L until 105L).foreach(id => assert(out(id), s"copy $id not flagged"))
    // fresh docs over a 200-word vocab share no 3-gram with 5 eval docs
    (200L until 205L).foreach(id => assert(!out(id), s"fresh $id flagged"))
  }

  test("dedupIncremental: empty seen keeps everything; seen==new drops everything") {
    import spark.implicits._
    val docs = randomDocs(25, seed = 23)
    val emptySeen = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.dedupIncremental(spark, docs, emptySeen).count() == 25)
    assert(Dedup.dedupIncremental(spark, docs, docs).count() == 0)
  }

  test("weightedSample: u is in [0,1) and keep is exactly u < weight") {
    val docs = randomDocs(200, seed = 31)
      .withColumn("w", (col("doc_id") % 10).cast("double") / 10.0)
    val out = Sampling.weightedSample(docs, col("w")).collect()
    out.foreach { r =>
      val (u, w, keep) = (r.getAs[Double]("u"), r.getAs[Double]("w"),
        r.getAs[Boolean]("keep"))
      assert(u >= 0.0 && u < 1.0)
      assert(keep == (u < w))
    }
  }

  test("dedupWithinDoc: idempotent, order-preserving, and conserves chunk counts") {
    for (k <- Seq(1, 2, 3)) {
      val docs = randomDocs(30, seed = 41 + k, vocab = 5, len = 12) // real repeats
      val once = TextStats.dedupWithinDoc(docs, chunkWords = k)
      val again = TextStats.dedupWithinDoc(
        once.select(col("doc_id"), col("kept_text").as("text")), chunkWords = k)
      // a deduped doc has no repeated chunk left → second pass drops nothing
      assert(again.agg(sum(col("n_dropped_chunks"))).head().getLong(0) == 0L,
        s"chunkWords=$k not idempotent")
      val acct = once.filter(col("n_chunks") !== // kept + dropped = enumerated
        (size(split(when(col("kept_text") === "", null).otherwise(col("kept_text")), " "))
          .cast("long") + col("n_dropped_chunks") * k).cast("long"))
      // accounting holds exactly only for k=1 (larger k has an odd tail); check k=1
      if (k == 1) assert(acct.count() == 0)
    }
  }

  test("mixResample: keep set is a subset of weightedSample at weight 1, expected counts ∝ n^alpha") {
    import spark.implicits._
    val docs = (0 until 800).map(i =>
      (i.toLong, s"s${if (i < 600) 0 else 1}")).toDF("doc_id", "source")
    val out = Sampling.mixResample(docs, alpha = 0.0) // equalize expected counts
    val kept = out.filter(col("keep")).groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("s1") == 200L) // smallest keeps all
    assert(kept("s0") > 140L && kept("s0") < 260L, s"~200 expected, got ${kept("s0")}")
  }

  test("joinAsOf: output cardinality equals the left side, values only from the right") {
    import spark.implicits._
    val left = spark.range(300).selectExpr("id AS tie", "id % 11 AS k",
      "(id * 13) % 40 AS ts", "CAST(0.0 AS DOUBLE) AS payload")
    val right = spark.range(100).selectExpr("id + 5000 AS tie", "id % 11 AS k",
      "(id * 7) % 40 AS ts", "CAST(1000 + id AS DOUBLE) AS v")
    val out = AsOf.joinAsOf(left, right, Seq("k"), "ts", "tie", "v").collect()
    assert(out.length == 300)
    out.foreach { r =>
      val v = r.getAs[java.lang.Double]("asof_value")
      assert(v == null || (v >= 1000.0 && v < 1100.0))
    }
  }

  test("corpusOverlap j_estimate is always n_equal/n_lanes in [0,1]") {
    val docs = randomDocs(50, seed = 53, vocab = 12)
    val r = Dedup.corpusOverlap(spark, docs, col("doc_id") % 3 === 0).head()
    val (nl, ne, j) = (r.getAs[Long]("n_lanes"), r.getAs[Long]("n_equal"),
      r.getAs[Double]("j_estimate"))
    assert(nl == 8L && ne >= 0L && ne <= nl)
    assert(math.abs(j - ne.toDouble / nl) < 1e-9)
  }

  test("dedupCorpus output is always a subset of the input with no exact-dup pair surviving") {
    import spark.implicits._
    // small vocab + short docs → plenty of exact and near dups
    val docs = randomDocs(60, seed = 37, vocab = 4, len = 6)
    val out = Dedup.dedupCorpus(spark, docs, maxBucket = 8)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val inIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(inIds))
    // no two survivors share identical text
    val texts = out.select("text").collect().map(_.getString(0))
    assert(texts.length == texts.distinct.length, "exact dup survived")
  }
}
