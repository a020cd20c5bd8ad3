package graft.ext

import org.apache.spark.sql.functions._

import graft.pumle.SparkSpec

/** Specs for the sketch-calibration and vector-QA round-4 additions. */
class Calibration4Spec extends SparkSpec {

  private def dup(base: String, tweak: Int): String =
    if (tweak == 0) base else base.dropRight(tweak) + ("z" * tweak)

  test("minhashCalibration: exact copies estimate 1.0 with zero error; all values in range") {
    import spark.implicits._
    val base = (0 until 8).map(i =>
      s"alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima $i")
    // pairs of identical docs + some perturbed near-dups
    val docs = (base.zipWithIndex.flatMap { case (t, i) =>
      Seq((i.toLong * 2, t), (i.toLong * 2 + 1, dup(t, i % 3)))
    }).toDF("doc_id", "text")
    val out = Dedup.minhashCalibration(spark, docs).collect()
    assert(out.nonEmpty, "no candidate pairs on a planted near-dup corpus")
    out.foreach { r =>
      val est = r.getAs[Double]("est_jaccard")
      val j = r.getAs[Double]("jaccard")
      assert(est >= 0.0 && est <= 1.0 && j >= 0.0 && j <= 1.0, s"range: $r")
      assert(math.abs(r.getAs[Double]("abs_err") - math.abs(est - j)) < 1e-6, s"err: $r")
      // estimates are eighths (8 lanes)
      assert(math.abs(est * 8 - math.round(est * 8)) < 1e-9, s"not a lane fraction: $r")
    }
    val exactCopies = out.filter(r =>
      r.getAs[Long]("a_id") % 2 == 0 && r.getAs[Long]("b_id") == r.getAs[Long]("a_id") + 1
        && r.getAs[Long]("a_id") / 2 % 3 == 0) // tweak == 0 pairs
    assert(exactCopies.nonEmpty)
    exactCopies.foreach { r =>
      assert(r.getAs[Double]("est_jaccard") == 1.0, s"copy pair est != 1: $r")
      assert(r.getAs[Double]("jaccard") == 1.0, s"copy pair jaccard != 1: $r")
      assert(r.getAs[Double]("abs_err") == 0.0, s"copy pair err != 0: $r")
    }
  }

  test("minhashCalibration pairs coincide with lshCandidates pairs") {
    import spark.implicits._
    val docs = (0 until 30).map { i =>
      (i.toLong, s"common shared prefix words here tail$i extra${i % 5}")
    }.toDF("doc_id", "text")
    val calib = Dedup.minhashCalibration(spark, docs)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.lshCandidates(spark, docs)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(calib == cand, s"calibration pairs $calib != candidates $cand")
  }

  test("sourceLeakage: planted cross-source copies dominate the matrix") {
    import spark.implicits._
    // each pair's text is UNIQUE to the pair (no corpus-wide shared
    // prefix — that would put all docs in one mega-bucket that the
    // degenerate-bucket cap rightly drops)
    val base = (0 until 6).map(i =>
      s"alpha$i bravo$i charlie$i delta$i echo$i foxtrot$i golf$i hotel$i india$i")
    // srcA docs copied verbatim into srcB; srcC is unrelated text
    val docs = (base.zipWithIndex.map { case (t, i) => (i.toLong, t, "srcA") } ++
      base.zipWithIndex.map { case (t, i) => (100L + i, t, "srcB") } ++
      (0 until 6).map(i => (200L + i, s"nothing in common row number $i entirely other words", "srcC")))
      .toDF("doc_id", "text", "source")
    val out = Dedup.sourceLeakage(spark, docs, threshold = 0.9).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("mean_jaccard"))).toMap
    val ab = out.getOrElse(("srcA", "srcB"), (0L, 0.0))
    assert(ab._1 == 6L, s"expected 6 A-B copy pairs, got $out")
    assert(ab._2 == 1.0, s"copy pairs must verify at jaccard 1.0: $out")
    assert(!out.keys.exists { case (a, b) => a == "srcC" || b == "srcC" },
      s"unrelated source leaked into the matrix: $out")
  }

  test("normProfile: hand-computed norms on unit and zero vectors") {
    import spark.implicits._
    val rows = Seq(
      (0L, Array(3.0f, 4.0f), 0),   // norm 5
      (1L, Array(0.0f, 0.0f), 0),   // zero vector
      (2L, Array(1.0f, 0.0f), 1),   // norm 1
      (3L, Array(0.0f, 2.0f), 1))   // norm 2
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.normProfile(spark, emb).orderBy("label").collect()
    assert(out.length == 2)
    val l0 = out(0)
    assert(l0.getAs[Long]("n_vecs") == 2 && l0.getAs[Long]("n_zero") == 1)
    assert(l0.getAs[Double]("min_norm") == 0.0 && l0.getAs[Double]("max_norm") == 5.0)
    assert(math.abs(l0.getAs[Double]("mean_norm") - 2.5) < 1e-9)
    val l1 = out(1)
    assert(l1.getAs[Long]("n_vecs") == 2 && l1.getAs[Long]("n_zero") == 0)
    assert(l1.getAs[Double]("min_norm") == 1.0 && l1.getAs[Double]("max_norm") == 2.0)
    assert(math.abs(l1.getAs[Double]("mean_norm") - 1.5) < 1e-9)
  }
}
