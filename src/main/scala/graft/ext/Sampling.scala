package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling / sharding operators a training-data pipeline needs
  * around dedup and scoring: deterministic train/val/test assignment and
  * context-window packing. Both are narrow or shard-local — no global
  * coordination, so they hold at any corpus size.
  */
object Sampling {

  /** Deterministic hash split: md5-derived bucket 0..99 per id →
    * train/val/test. No RNG and no global state — the same doc lands in
    * the same split on every run, engine, and partitioning (the property
    * that makes incremental corpus refreshes reproducible). Narrow
    * per-row transform. */
  def hashSplit(docs: DataFrame, idCol: String = "doc_id",
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct + valPct <= 100, "split percentages exceed 100")
    docs
      .withColumn("bucket",
        conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
          .cast("long") % 100)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Deterministic weighted (importance) sampling: keep a doc iff its
    * md5-derived uniform `u(id) ∈ [0,1)` is below `weight` (a quality
    * score, resampling ratio, …). RNG-free Bernoulli thinning — the
    * same doc decides the same way on every run, engine, and
    * partitioning, so incremental refreshes are reproducible. `u` is
    * a 24-bit hash over 2²⁴: EXACT in binary floating point, which
    * keeps the keep-decision bit-identical cross-engine without any
    * rounding contract. Narrow per-row. */
  def weightedSample(docs: DataFrame, weight: org.apache.spark.sql.Column,
      idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("u",
        conv(substring(md5(col(idCol).cast("string")), 1, 6), 16, 10)
          .cast("double") / 16777216.0)
      .withColumn("keep", col("u") < weight)

  /** Temperature-based source mixing (the multilingual/multi-source
    * data-mix pass: expected kept docs per source ∝ n_s^alpha, the
    * p^α re-weighting used to keep head sources from drowning the
    * tail). Keep probability per source is
    * `(min_n / n_s)^(1-alpha)` — the smallest source keeps everything
    * and larger sources are thinned toward the tempered distribution;
    * `alpha = 1` keeps every doc (no tempering), `alpha = 0` equalizes
    * expected counts across sources. The decision itself is
    * `weightedSample`'s md5 uniform: RNG-free, reproducible across
    * runs, engines, and partitionings.
    *
    * Scale shape: the per-source histogram is one partial-aggregable
    * groupBy (source-bounded output), the weight table is
    * source-bounded → broadcast joined back, and the keep decision is
    * narrow per-row. The weight is rounded to 6 decimals on both
    * engines so the `u < weight` comparison has no FP-boundary
    * ambiguity cross-engine (u's granularity is 2⁻²⁴ ≈ 6e-8). */
  def mixResample(docs: DataFrame, alpha: Double = 0.5,
      sourceCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0, 1]")
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_src"))
    // min over the AGGREGATED frame (source-bounded, ~10s of rows) via an
    // unpartitioned window: bounded by contract, and it keeps the
    // histogram subtree single-evaluation (a separate min() aggregate
    // would reference `counts` twice → two corpus scans)
    val whole = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val weights = counts
      .withColumn("mix_weight",
        round(pow(min(col("n_src")).over(whole).cast("double") /
          col("n_src").cast("double"), lit(1.0 - alpha)), 6))
      .select(col(sourceCol), col("n_src"), col("mix_weight"))
    weightedSample(docs.join(broadcast(weights), Seq(sourceCol)),
      col("mix_weight"), idCol)
  }

  /** Deterministic per-stratum sample: the k docs with the smallest
    * md5 id-hash per stratum — a uniform sample without RNG. Stable
    * under reruns AND corpus growth: a doc's hash never changes, so the
    * sample only shifts where membership actually changes (the property
    * rand()-based sampling lacks). Per-stratum window; k is small by
    * contract, stratum count is the parallelism. */
  def stratifiedSample(docs: DataFrame, k: Int, stratumCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(stratumCol)).orderBy(col("h"), col(idCol))
    docs
      .withColumn("h",
        conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10).cast("long"))
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
      .drop("h")
  }

  /** Context-window packing: docs in id order within a shard, each
    * assigned the bin its cumulative token offset falls in
    * (bin = tokens_before DIV budget) plus its offset inside that bin —
    * the standard streaming approximation of greedy sequence packing.
    * Packing is PER-SHARD (`shardCol`) by design: the global-order
    * variant is a no-partition window that serializes the whole corpus
    * through one task. A shard is the unit a packer writes anyway. */
  def packSequences(docs: DataFrame, budget: Int, shardCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(shardCol), col(idCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin", expr(s"(cum - n_tokens) DIV $budget"))
      .withColumn("offset_in_bin", expr(s"cum - n_tokens - ((cum - n_tokens) DIV $budget) * $budget"))
      .drop("cum")
  }

  /** Skew-guarded packing: in `packSequences` one giant shard serializes
    * its whole window through a single task. Here every shard is salted
    * into `subShards` deterministic sub-shards (xxhash64 of the id),
    * each packed independently — the hot shard's window becomes
    * `subShards` parallel windows — and every sub-shard's bins are
    * REBASED by the bin count of the sub-shards before it, keeping bin
    * ids globally unique and contiguous per shard. The rebase side is
    * CLOSED-FORM (`nbins = (total − last_n) DIV budget + 1` from a tiny
    * per-(shard,sub) aggregate — no second window evaluation, just one
    * extra scan of the narrow token projection) and is shard×subShards
    * rows, so AQE broadcasts the join back. The trade: one more narrow
    * pass buys a per-task row bound of shard/subShards — the base
    * variant must SORT THE WHOLE SHARD IN ONE TASK, which spills or
    * OOMs at real shard sizes. Same output contract as `packSequences`;
    * the greedy order differs (docs group by salt before packing),
    * which is an equally-valid packing — `subShards = 1` reproduces
    * `packSequences` exactly. */
  def packSequencesSalted(docs: DataFrame, budget: Int, subShards: Int = 8,
      shardCol: String = "source", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(subShards >= 1, "subShards must be positive")
    val toks = docs.select(col(shardCol), col(idCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("sub", pmod(xxhash64(col(idCol)), lit(subShards)).cast("int"))
    val w = Window.partitionBy(col(shardCol), col("sub")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = toks
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("local_bin", expr(s"(cum - n_tokens) DIV $budget"))
      .withColumn("offset_in_bin",
        expr(s"cum - n_tokens - ((cum - n_tokens) DIV $budget) * $budget"))
    // bins a sub-shard occupies = the bin of its LAST doc + 1, which is
    // closed-form from (total tokens, last doc's tokens) — one partial-
    // aggregable pass over the narrow token projection
    val prefix = Window.partitionBy(col(shardCol)).orderBy(col("sub"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val rebase = toks.groupBy(col(shardCol), col("sub"))
      .agg(sum(col("n_tokens")).as("tot"),
        max_by(col("n_tokens"), col(idCol)).as("last_n"))
      .withColumn("nbins", expr(s"(tot - last_n) DIV $budget") + lit(1L))
      .withColumn("bin_base", coalesce(sum(col("nbins")).over(prefix), lit(0L)))
      .select(col(shardCol), col("sub"), col("bin_base"))
    local.join(rebase, Seq(shardCol, "sub"))
      .select(col(shardCol), col(idCol), col("n_tokens"),
        (col("local_bin") + col("bin_base")).as("bin"), col("offset_in_bin"))
  }

  /** Leakage-free train/test split: near-duplicate CLUSTERS (LSH
    * candidates → connected components, [[Dedup.clusters]]) are
    * assigned to a split as a unit — the md5 bucket is computed over
    * the `cluster_id`, not the doc id, so two near-duplicate documents
    * can never straddle the train/test boundary (the classic
    * eval-inflation leak a doc-keyed [[hashSplit]] cannot prevent).
    * Docs outside every candidate pair are their own singleton cluster
    * (cluster_id = doc_id). Same bucket/threshold spelling as
    * [[hashSplit]], so the two splits are directly comparable.
    * Scale: rides the dedup stack's candidate-bounded shapes; the
    * split decision itself is narrow. */
  def clusterSplit(spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame, trainPct: Int = 90,
      idCol: String = "doc_id"): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100, "trainPct out of range")
    val pairs = Dedup.lshCandidates(spark, docs)
    val cl = Dedup.clusters(spark, pairs)
      .select(col("node").as(idCol), col("cluster_id"))
    docs.select(col(idCol))
      .join(cl, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
      .withColumn("bucket",
        conv(substring(md5(col("cluster_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 100)
      .withColumn("split",
        when(col("bucket") < trainPct, "train").otherwise("test"))
  }

  /** Semantic-cluster-capped balanced subsampling: assign every
    * embedding to its nearest fixed centroid
    * ([[Similarity.assignFixed]] — zero-shuffle, oracle-replayable) and
    * keep at most `cap` rows per cluster (smallest `vec_id` first — a
    * deterministic selection; swap the ordering column for a quality
    * score to keep the best instead). The embedding-space analogue of
    * [[Corpus]]'s per-source caps: it stops one dominant semantic
    * cluster (boilerplate, templates, one topic crawled too hard) from
    * owning the training mix. Returns ALL rows with
    * `(vec_id, centroid, rk, kept)` so the caller gets both the subset
    * and the per-cluster census.
    *
    * Scale shape: one narrow assignment pass + one rank shuffle keyed
    * by centroid. A pathologically hot centroid makes that window
    * skew-bound — at that point swap in the two-phase salted rank
    * ([[Corpus.sourceCapSalted]]'s discipline) which bounds every task
    * at `cap · salts` rows; the plain window is kept here because the
    * output contract (exact `rk` over ALL rows, not just survivors)
    * is what the census consumers want. */
  def clusterCap(spark: org.apache.spark.sql.SparkSession, emb: DataFrame,
      k: Int = 16, cap: Int = 16, dims: Int = 64): DataFrame =
    Similarity.assignFixed(spark, emb, k, dims)
      .select(col("vec_id"), col("centroid"))
      .withColumn("rk", row_number()
        .over(Window.partitionBy(col("centroid")).orderBy(col("vec_id")))
        .cast("long"))
      .withColumn("kept", col("rk") <= cap)
      .orderBy(col("vec_id"))
}
