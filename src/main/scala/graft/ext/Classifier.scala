package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hashed linear quality classifier — the fastText-style scorer every
  * production data pipeline runs in front of pretraining ("does this
  * document look like the high-quality reference set?"), expressed
  * Spark-first. Reference scope: LLM-pipeline surface (builder brief) —
  * no PUMLE counterpart.
  *
  * Model = a `buckets`-entry weight table over md5-hashed unigrams plus
  * a bias, in integer MILLI units (3-dp fixed point). Milli weights make
  * the per-document token-weight sum an exact BIGINT — order-free, so
  * the relational (explode + broadcast-join + groupBy) and compiled
  * narrow (one `aggregate` expression, zero shuffles) scorers are
  * bit-identical, and a DuckDB oracle can replay the whole contract:
  * logit = round(sum_milli / (1000·n_tokens) + bias_milli/1000, 9),
  * score = round(sigmoid(logit), 6) — the sigmoid is applied to the
  * ROUNDED logit so both engines feed `exp` the identical double.
  *
  * Scale shape: the weight table is bucket-bounded (256 rows — never
  * corpus-proportional), the relational scorer shuffles once on doc_id,
  * and the narrow scorer streams unchanged (no explode, no join, no
  * aggregate) — the q126 DSIR-twin pattern applied to classification.
  * Training ([[trainQcModel]]) is batch gradient descent: one
  * bucket-bounded gradient aggregation per iteration (the collect is
  * `buckets` rows — k·buckets driver I/O total, independent of corpus
  * size), with the learned weights HALF_UP-quantized to milli on exit —
  * weight quantization as a feature: the deployed model is exactly the
  * persistable integer table the scorers consume.
  */
object Classifier {

  /** Per-document token cap (shared with the shingle/ngram ops): bounds
    * work per row so one pathological document can't own a task. */
  val MaxTokens: Int = graft.functions.MinHash48.MaxShinglePos

  /** Token → bucket: first 8 md5 hex chars mod `buckets` (the DSIR
    * feature-hash contract, unigram flavor). */
  private def bucketSql(tok: String, buckets: Int): String =
    s"CAST(conv(substr(md5($tok), 1, 8), 16, 10) AS BIGINT) % $buckets"

  private def md5Head6(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.take(3).foldLeft(0L)((acc, b) => acc * 256 + (b & 0xff))
  }

  /** A quality-classifier model: integer milli-unit weights (index =
    * bucket) and bias. w_b = weightsMilli(b) / 1000. */
  final case class QcModel(weightsMilli: IndexedSeq[Long], biasMilli: Long,
      buckets: Int) {
    require(weightsMilli.length == buckets,
      s"${weightsMilli.length} weights for $buckets buckets")
  }

  /** The deterministic md5-derived demo model (the PQ fixed-codebook
    * trick, q127): weights in [-1, 1] at 3 dp, bias 0 — lets the full
    * scoring contract be ORACLE-checked end to end (a trained model's
    * FP weights aren't reproducible by an independent engine; a fixed
    * one is replayable from `md5` in pure SQL). */
  def fixedModel(buckets: Int = 256): QcModel =
    QcModel(IndexedSeq.tabulate(buckets)(b =>
      md5Head6(s"qc:$b") % 2001 - 1000), 0L, buckets)

  /** Relational scorer: explode capped tokens, broadcast-join the
    * bucket-bounded weight table, one doc-keyed exact-integer sum.
    * Null-text docs are excluded (they have no feature vector). */
  def qcScore(spark: SparkSession, docs: DataFrame, model: QcModel,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import spark.implicits._
    val wTbl = model.weightsMilli.zipWithIndex
      .map { case (w, b) => (b.toLong, w) }.toDF("b", "w_milli")
    val toks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), split(col(textCol), " ").as("ws"))
      .select(col(idCol), least(size(col("ws")), lit(MaxTokens))
        .cast("long").as("n_tokens"),
        explode(expr(s"""transform(sequence(1, least(size(ws), $MaxTokens)),
          |  i -> ${bucketSql("element_at(ws, i)", model.buckets)})"""
          .stripMargin)).as("b"))
    toks.join(broadcast(wTbl), Seq("b"))
      .groupBy(col(idCol), col("n_tokens"))
      .agg(sum(col("w_milli")).as("s"))
      .select(Seq(col(idCol), col("n_tokens")) ++ scoreCols(model): _*)
  }

  /** logit/score columns from the exact milli sum `s` and `n_tokens` —
    * ONE spelling shared by both scorers (and mirrored in the oracle):
    * divide the exact integers, add the bias, round to 9 dp, THEN
    * sigmoid and round to 6 dp. */
  private def scoreCols(model: QcModel): Seq[org.apache.spark.sql.Column] = {
    val logit = round(
      col("s").cast("double") / (lit(1000.0) * col("n_tokens").cast("double"))
        + lit(model.biasMilli).cast("double") / lit(1000.0), 9)
    Seq(logit.as("logit"),
      round(lit(1.0) / (lit(1.0) + exp(-logit)), 6).as("score"))
  }

  /** Compiled-narrow scorer: the model rides as a constant reference
    * object inside the [[graft.functions.QcScore]] expression — one
    * tight per-row loop (tokenize, md5-bucket, exact integer sum),
    * zero shuffles, zero joins, streams unchanged. The interpreted SQL
    * fold this replaced was SLOWER than the relational form at sf1
    * (7.6s vs 3.9s / 50k docs): higher-order lambdas interpret per
    * token, and the per-token work is an md5. Exact-integer milli sums
    * keep it bit-identical to [[qcScore]] (q130 shares q129's oracle
    * VERBATIM). */
  def qcScoreNarrow(docs: DataFrame, model: QcModel,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.functions.QcScore.register(docs.sparkSession,
      new graft.functions.QcModelRef(model.weightsMilli.toArray))
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), expr(s"qc_score($textCol)").as("g"))
      .select(Seq(col(idCol), col("g.n_tokens").as("n_tokens"),
        col("g.s").as("s")): _*)
      .select(Seq(col(idCol), col("n_tokens")) ++ scoreCols(model): _*)
  }

  /** Persist a model: `path/weights` (b, w_milli) + `path/meta`
    * (bias_milli, buckets) — bucket-bounded, metadata-scale I/O. */
  def writeQcModel(spark: SparkSession, model: QcModel,
      path: String): Unit = {
    import spark.implicits._
    model.weightsMilli.zipWithIndex
      .map { case (w, b) => (b, w) }.toDF("b", "w_milli")
      .write.mode("overwrite").parquet(s"$path/weights")
    Seq((model.biasMilli, model.buckets)).toDF("bias_milli", "buckets")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Reload a persisted model — integers round-trip exactly. */
  def loadQcModel(spark: SparkSession, path: String): QcModel = {
    val meta = spark.read.parquet(s"$path/meta").head()
    val buckets = meta.getInt(1)
    val byB = spark.read.parquet(s"$path/weights")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    QcModel(IndexedSeq.tabulate(buckets)(byB(_)), meta.getLong(0), buckets)
  }

  /** Train by batch gradient descent on the hashed mean-weight logit
    * z = Σ w_{b(t)}/n + bias, y = `labelPred`, log-loss. The cached
    * frame is ONE ROW PER DOC (label, token count, bucket ARRAY —
    * tokens hashed once, text never re-read), and each iteration is a
    * single aggregation job: the per-doc logit folds the bucket array
    * against the current weights as a narrow literal (no doc-keyed
    * shuffle, no join), the residual rides the row into an explode
    * whose sentinel bucket −1 carries the bias gradient, and everything
    * reduces to the bucket grid (`buckets`+1 rows collected — never the
    * corpus). Driver work per iteration is the bounded update. Exit
    * quantizes HALF_UP to milli, yielding the exact-arithmetic
    * [[QcModel]] the scorers and the oracle contract consume. */
  def trainQcModel(spark: SparkSession, docs: DataFrame,
      labelPred: org.apache.spark.sql.Column, buckets: Int = 256,
      iters: Int = 20, lr: Double = 2.0, idCol: String = "doc_id",
      textCol: String = "text"): QcModel = {
    val base = docs.filter(col(textCol).isNotNull)
      .select(labelPred.cast("double").as("y"),
        split(col(textCol), " ").as("ws"))
      .withColumn("n", least(size(col("ws")), lit(MaxTokens)))
      .select(col("y"), col("n"),
        expr(s"""transform(sequence(1, n),
          |  i -> ${bucketSql("element_at(ws, i)", buckets)})"""
          .stripMargin).as("bs"))
      .persist()
    try {
      val nDocs = base.count().toDouble
      var w = Array.fill(buckets)(0.0)
      var bias = 0.0
      var it = 0
      while (it < iters) {
        val grad = base
          .withColumn("wv", typedLit(w.toIndexedSeq))
          .withColumn("p", expr(s"""1.0D / (1.0D + exp(-(
            |  aggregate(bs, 0.0D, (acc, b) ->
            |    acc + element_at(wv, CAST(b AS INT) + 1)) / n + $bias)))"""
            .stripMargin))
          .select(col("p"), col("y"), col("n"),
            explode(expr("concat(bs, array(-1L))")).as("b"))
          .groupBy(col("b"))
          .agg(sum(expr(
            "CASE WHEN b = -1 THEN p - y ELSE (p - y) / n END")).as("g"))
          .collect().map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
        w = Array.tabulate(buckets)(b => w(b) - lr * grad.getOrElse(b, 0.0) / nDocs)
        bias -= lr * grad.getOrElse(-1, 0.0) / nDocs
        it += 1
      }
      def milli(x: Double): Long = new java.math.BigDecimal(x)
        .setScale(3, java.math.RoundingMode.HALF_UP)
        .movePointRight(3).longValueExact()
      QcModel(w.map(milli).toIndexedSeq, milli(bias), buckets)
    } finally { base.unpersist() }
  }

  /** Mean log-loss of a model on a labeled corpus (spec/monitoring
    * helper — one narrow pass + one global agg). */
  def logLoss(docs: DataFrame, model: QcModel,
      labelPred: org.apache.spark.sql.Column,
      idCol: String = "doc_id", textCol: String = "text"): Double = {
    qcScoreNarrow(docs, model, idCol, textCol)
      .join(docs.select(col(idCol), labelPred.cast("double").as("y")),
        Seq(idCol))
      .agg(avg(expr(
        "-(y * ln(greatest(score, 1e-9)) + (1 - y) * ln(greatest(1 - score, 1e-9)))")))
      .head().getDouble(0)
  }
}
