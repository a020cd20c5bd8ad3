package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.MinHash48

/** Deduplication operators over a document table (id + text) — the
  * engine's user-facing dedup API (SURVEY §7.4 / builder-prompt north
  * star). All deterministic (md5-derived hashing), all scale-shaped:
  * narrow signature computation, uniform bucket keys, degenerate-bucket
  * capping before any pair join.
  */
object Dedup {

  /** localCheckpoint + hand back exactly the RDD(s) backing it, so
    * iterative loops can free superseded rounds' blocks. The backing
    * RDD is read off the checkpointed Dataset's own analyzed plan
    * (a checkpointed Dataset IS a LogicalRDD) — never a before/after
    * `getPersistentRDDs` diff, which would capture blocks persisted by
    * ANY concurrent job in the session during the window and later
    * unpersist someone else's cache. */
  private[ext] def checkpointTracked(
      df: DataFrame): (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
    val out = df.localCheckpoint(true)
    val backing = out.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    (out, backing)
  }

  /** [[checkpointTracked]]'s LAZY twin: the checkpoint materializes on
    * the FIRST action over the returned frame (not at call time), so a
    * plan with several consumers of the same expensive subtree — e.g.
    * a decode-once media frame feeding both stages of an admit —
    * evaluates it once without going eager. Same release contract:
    * consume fully, then unpersist the blocks (the lineage is
    * truncated — the frame is NOT re-computable after release). */
  private[graft] def checkpointLazyTracked(
      df: DataFrame): (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
    val out = df.localCheckpoint(false)
    val backing = out.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    (out, backing)
  }

  /** Exact HALF_UP 6-dp rounding of the rational i/u, in integer
    * arithmetic: `round(CAST(i/u AS DOUBLE), 6)` rounds the DOUBLE, and
    * engines disagree at decimal midpoints the binary value straddles
    * (observed: a 39/640 true Jaccard hashed differently vs DuckDB at
    * sf0.001). `(2·i·10⁶ + u) DIV (2·u)` is the exact half-up 6-dp
    * numerator of the true rational; dividing that integer by 10⁶ is
    * the same correctly-rounded double on every IEEE engine. The
    * floor-of-double-division form is exact here because i ≤ u ≤ 2×
    * MaxShinglePos: operands < 2⁵³ and the quotient is ≥ 1/(2u) away
    * from any integer it doesn't equal — far beyond one ulp.
    * u = 0 (both sets empty) reports 1.0 by convention. */
  private[graft] def ratio6(i: org.apache.spark.sql.Column,
      u: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(u === 0, lit(1.0)).otherwise(
      floor((i.cast("long") * lit(2000000L) + u.cast("long")).cast("double")
        / (u.cast("long") * lit(2L)).cast("double"))
        .cast("double") / lit(1000000.0))

  /** Exact dedup: group by content hash, keep the smallest id. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Per-row k-permutation MinHash signature as array<long> (the
    * custom minhash48 expression — one pass, no explode). md5-based:
    * portable across engines (the oracle contract). */
  def minhashSignatures(spark: SparkSession, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    MinHash48.register(spark)
    // null text: the relational form (explode of split(NULL) → no rows)
    // and the oracle DROP the document; match that, don't emit NULL sigs
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), expr(s"minhash48($textCol)").as("sig"))
  }

  /** Production-speed signature variant: Spark's built-in `xxhash64`
    * (codegen'd, ~an order of magnitude cheaper than md5) with the
    * permutation index as seed. Deterministic and stable across Spark
    * versions, but NOT cross-engine portable — use `minhashSignatures`
    * when results must match an external oracle. Same output schema. */
  def minhashSignaturesFast(docs: DataFrame, k: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val maxPos = MinHash48.MaxShinglePos
    val sh = docs
      .withColumn("pos", explode(sequence(lit(1),
        least(greatest(length(col(textCol)) - 7, lit(1)), lit(maxPos)))))
      .select(col(idCol).as("doc_id"),
        col(textCol).substr(col("pos"), lit(8)).as("sh"))
    val aggs = (0 until k).map(p => min(xxhash64(lit(p), col("sh"))).as(s"m$p"))
    sh.groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), array((0 until k).map(p => col(s"m$p")): _*).as("sig"))
  }

  /** Band-bucket rows `(doc_id, band, bucket)` for a corpus — the
    * shared building block of `lshCandidates`, `dedupIncremental`, and
    * the streaming near-dup flagger. Narrow: one minhash48 per row, one
    * `stack` per signature. */
  def bandBuckets(spark: SparkSession, docs: DataFrame, bands: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // NOT spread here: bandBuckets' hot callers hand it increment-sized
    // frames (dedupIncremental*'s notExact) where an extra exchange
    // measured slower than the single-task signature pass it would
    // parallelize; corpus-sized callers (lshCandidates, lshCapStats)
    // spread at their own entry
    val sig = minhashSignatures(spark, docs, idCol, textCol)
    val stack = (0 until bands).map(b => s"$b, sig[$b]").mkString(", ")
    sig.selectExpr("doc_id", s"stack($bands, $stack) AS (band, bucket)")
  }

  /** LSH banding over single-row bands of the signature → candidate
    * pairs (a_id < b_id, n_shared_bands). Buckets larger than
    * `maxBucket` are dropped (no near-dup signal, unbounded join cost)
    * BEFORE any doc-id list materializes: bucket sizes come from a
    * count aggregate, degenerate buckets are filtered, and only then
    * are the (≤ maxBucket) ids collected for in-array pair expansion —
    * so no aggregation buffer ever holds a mega-bucket.
    *
    * The cap is not silent: pass `capMetrics` (an `Observation`) to see
    * what it cost — `dropped_buckets` (band-buckets excluded) and
    * `dropped_doc_slots` (doc×band memberships excluded; an upper bound
    * on docs that lost candidate edges, since one doc can sit in several
    * dropped buckets). Read it after the first action on the result —
    * the OP-A5 observe pattern (Pipeline.silverObserved) applied to the
    * dedup path. Caveat: if EVERY bucket is capped the result is empty
    * and AQE's empty-relation propagation erases the observed subtree
    * (the Observation completes with an empty map, never hangs) — use
    * `lshCapStats` when an always-exact answer is required. */
  def lshCandidates(spark: SparkSession, docs: DataFrame, bands: Int = 4,
      maxBucket: Int = 10, idCol: String = "doc_id", textCol: String = "text",
      capMetrics: Option[org.apache.spark.sql.Observation] = None): DataFrame =
    lshCandidatesTracked(spark, docs, bands, maxBucket, idCol, textCol,
      capMetrics)._1

  /** [[lshCandidates]] handing back the RDDs behind its band-bucket
    * checkpoint, so eager pipelines (dedupCorpus, minhashCalibration,
    * sourceLeakage) can free them once candidates are materialized.
    *
    * The bucket table is SPREAD + lazily materialized ONCE: its two
    * consumers (the bucket-size census and the id-collecting join-back)
    * sit under DIFFERENT projections, so ReuseExchange never dedupes
    * them and the whole signature pass — the corpus-sized cost of the
    * operator — used to run TWICE per action (measured at the sf0.1
    * bench: two ~0.3 s signature jobs inside every LSH query; at scale
    * that is two full corpus scans + md5 passes where one suffices).
    * The checkpoint is LAZY (computed by the first action, no extra
    * eager job) and carries 3 flat columns per (doc, band).
    *
    * The checkpoint is deliberately NOT scale-gated (round-15 probe,
    * guide §1.2): gating it off below Par.isBig's bar — the VERDICT
    * r14 hypothesis that the persist overhead caused q137's bench
    * regression — measured WORSE across the board in a controlled
    * same-session A/B at sf0.1 (q104 3.72→4.81, q137 3.80→5.15,
    * q134 2.65→3.31, q65 1.93→2.48, q52 0.67→0.83 min-of-3): the
    * doubled signature pass costs more than the persist even on the
    * small fixtures, and at scale the checkpoint wins by construction. */
  private[ext] def lshCandidatesTracked(spark: SparkSession, docs: DataFrame,
      bands: Int = 4, maxBucket: Int = 10, idCol: String = "doc_id",
      textCol: String = "text",
      capMetrics: Option[org.apache.spark.sql.Observation] = None)
      : (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
    // spread BEFORE the signature expression: a one-split corpus scan
    // would serialize the whole minhash pass on one task (Par.spread)
    val sig = minhashSignatures(spark, Par.spreadIfBig(docs), idCol, textCol)
    val stack = (0 until bands).map(b => s"$b, sig[$b]").mkString(", ")
    val (buckets, bucketRdds) = checkpointLazyTracked(
      sig.selectExpr("doc_id", s"stack($bands, $stack) AS (band, bucket)"))
    val sized0 = buckets.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bsize"))
    val sized = capMetrics.fold(sized0)(o => sized0.observe(o,
      sum(when(col("bsize") > maxBucket, lit(1L)).otherwise(lit(0L)))
        .as("dropped_buckets"),
      sum(when(col("bsize") > maxBucket, col("bsize")).otherwise(lit(0L)))
        .as("dropped_doc_slots")))
    val small = sized
      .filter(col("bsize").between(2, maxBucket))
      .select(col("band"), col("bucket"))
    (buckets.join(small, Seq("band", "bucket")) // drops mega-buckets pre-collect
      .groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y ->
          |    struct(x AS a_id, y AS b_id))))""".stripMargin)).as("pair"))
      .select(col("pair.a_id"), col("pair.b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared_bands")), bucketRdds)
  }

  /** Exact cap diagnostics as a standalone one-row aggregate (OP-A5 as
    * a diagnostic query, mirroring Pipeline.gatherDropStats) — the
    * always-correct companion to the zero-cost `capMetrics` observation
    * on `lshCandidates`, which AQE empty-relation propagation erases
    * when every bucket is capped. Reports what the `maxBucket` cap
    * dropped (band-buckets and the doc×band memberships they held),
    * what survived, and the hottest bucket. Two partial-aggregable
    * shuffles, no join — same cost shape as the signature stage. */
  def lshCapStats(spark: SparkSession, docs: DataFrame, bands: Int = 4,
      maxBucket: Int = 10, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sig = minhashSignatures(spark, Par.spreadIfBig(docs), idCol, textCol)
    val stack = (0 until bands).map(b => s"$b, sig[$b]").mkString(", ")
    sig.selectExpr("doc_id", s"stack($bands, $stack) AS (band, bucket)")
      .groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bsize"))
      .agg(
        sum(when(col("bsize") > maxBucket, lit(1L)).otherwise(lit(0L)))
          .as("dropped_buckets"),
        sum(when(col("bsize") > maxBucket, col("bsize")).otherwise(lit(0L)))
          .as("dropped_doc_slots"),
        sum(when(col("bsize").between(2, maxBucket), lit(1L)).otherwise(lit(0L)))
          .as("kept_buckets"),
        max(col("bsize")).as("max_bucket_size"))
  }

  /** Connected components over candidate pairs → dedup clusters:
    * every doc labeled with the smallest doc_id reachable through the
    * near-dup graph (the canonical survivor). Iterative min-label
    * propagation — each hop is one shuffle join on the (sparse, capped)
    * candidate graph, and TWO hops run inside each materialized round
    * (one plan, one checkpoint, one fixpoint-check job) — distance 2
    * per round, halving the per-round job overhead that dominates on
    * the tiny diameters LSH candidate graphs produce. Converges by
    * fixpoint check, capped at `maxIter` rounds (= 2·maxIter hops). */
  def clusters(spark: SparkSession, pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // localCheckpoint truncates lineage each round — without it the
    // plan tree grows exponentially across iterations (OOM at planning
    // time, the classic iterative-DataFrame trap). Each checkpoint
    // PERSISTS its RDD for the life of the session, so superseded
    // rounds must be unpersisted explicitly: on a long-lived session
    // the leaked blocks occupy storage memory and starve every later
    // stage (observed as GC thrash in queries run after clusters()).
    // Tracking reads the backing RDD off the checkpointed plan itself
    // (Dedup.checkpointTracked) — robust to concurrent jobs.
    // the input subtree materializes ONCE before the symmetric union
    // references it twice: for expensive upstreams (LSH) the double
    // reference would otherwise re-evaluate the whole subtree per side
    // (exchange reuse is plan-dependent, not a guarantee)
    val (cp, cpRdds) = Par.labeled(pairs, "components: edge input") {
      checkpointTracked(pairs.select(col("a_id"), col("b_id")))
    }
    // (probed round 14: a localCheckpoint does NOT carry its input's
    // hash partitioning under AQE — LogicalRDD reports
    // UnknownPartitioning — so pre-partitioning edges by the hop join
    // key here would buy nothing; the hop joins broadcast the label
    // side or re-exchange as AQE decides)
    val (edges, edgeRdds) = Par.labeled(pairs, "components: symmetric edges") {
      checkpointTracked(
        cp.unionAll(cp.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
          .distinct())
    }
    cpRdds.foreach(_.unpersist(blocking = false)) // dead once edges exist
    var (labels, labelRdds) = Par.labeled(pairs, "components: label init") {
      checkpointTracked(
        edges.select(col("a_id").as("node"))
          .distinct()
          .withColumn("cluster_id", col("node")))
    }
    // each hop can CARRY columns alongside the propagated minimum: self
    // rows keep them, neighbor rows contribute null (max ignores
    // nulls), so values survive the aggregate. The round carries the
    // first hop's label into the second, and the fixpoint check becomes
    // a column compare INSIDE the checkpoint job (read via Observation,
    // which completes at the eager localCheckpoint) instead of a
    // separate join+count action per round. Min-label propagation is
    // MONOTONE, so "second hop changed nothing vs the first" already
    // proves a fixpoint — no confirming round: a diameter-2 candidate
    // graph (the usual LSH shape) finishes in ONE materialized round.
    def hop(l: DataFrame, carry: Seq[String]): DataFrame = {
      val viaNeighbors = edges
        .join(l, edges("b_id") === l("node"))
        .select(col("a_id").as("node") +: col("cluster_id") +:
          carry.map(c => lit(null).cast("long").as(c)): _*)
      l.select(col("node") +: col("cluster_id") +: carry.map(col): _*)
        .unionAll(viaNeighbors)
        .groupBy(col("node"))
        .agg(min(col("cluster_id")).as("cluster_id"),
          carry.map(c => max(col(c)).as(c)): _*)
    }
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val obs = org.apache.spark.sql.Observation()
      val (next, nextRdds) = Par.labeled(pairs, s"components: hop round ${i + 1}") {
        checkpointTracked(
          hop(hop(labels, Nil).withColumn("mid", col("cluster_id")), Seq("mid"))
            .observe(obs, sum(when(col("cluster_id") =!= col("mid"), lit(1L))
              .otherwise(lit(0L))).as("inner_changed"))
            .select(col("node"), col("cluster_id")))
      }
      // sum over zero rows is NULL (empty edge graph) — treat as converged
      val innerChanged = Option(obs.get.getOrElse("inner_changed", null))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      // previous round's blocks are dead once `next` is materialized
      labelRdds.foreach(_.unpersist(blocking = false))
      labels = next
      labelRdds = nextRdds
      converged = innerChanged == 0
      i += 1
    }
    // the result's lineage is truncated at its own checkpoint — the edge
    // blocks are no longer reachable and can be freed now. The final
    // labels blocks stay cached (they back the returned DataFrame) and
    // are released by the ContextCleaner when the caller drops it.
    edgeRdds.foreach(_.unpersist(blocking = false))
    labels
  }

  /** Connected components via alternating large-star / small-star
    * rounds (Kiveris et al., "Connected Components in MapReduce and
    * Beyond") — the O(log n)-round alternative to `clusters`' min-label
    * propagation, whose round count is the graph DIAMETER. LSH
    * candidate graphs are shallow (label propagation wins there — it
    * stays the default), but chunk/link graphs can chain thousands
    * deep; this variant converges in logarithmic rounds regardless.
    *
    * Join-based formulation: per-node minima come from a groupBy +
    * join-back, never a `collect_list` of neighbors — a celebrity hub's
    * adjacency never materializes in one aggregation buffer.
    *  - large-star: every neighbor v > u re-hangs onto min(Γ(u) ∪ {u})
    *  - small-star: over larger→smaller directed edges, u and its
    *    smaller neighbors re-hang onto their minimum
    * Same lineage discipline as `clusters`: every round is
    * localCheckpointed (truncated plans) and superseded blocks are
    * freed; convergence = order-independent edge-set checksum stable
    * across a full round. Output schema matches `clusters`:
    * (node, cluster_id = component minimum). */
  def clustersAltStar(spark: SparkSession, pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    // Both star steps repartition BY u up front: hash(u) clusters (u, v)
    // too, so the distinct, the per-u min aggregate AND the join-back
    // all run on that ONE exchange within the star's plan (previously
    // the distinct exchanged on (u, v), then the aggregate and join each
    // re-exchanged on u — ~4 exchanges per star; guide §2.4). The
    // explicit repartition is load-bearing: a localCheckpoint reports
    // UnknownPartitioning under AQE (probed round 14), so each star must
    // (re-)establish the u-clustering itself — once, not per consumer.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
        .repartition(col("u")).distinct()
      val mins = sym.groupBy(col("u"))
        .agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      sym.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .repartition(col("u")).distinct()
    }
    // smallStar's input is ALWAYS a largeStar output (see the loop):
    // every edge already oriented u > v (v ≤ old-u < new-u by the
    // large-star re-hang) and already distinct — the general form's
    // re-orientation pass (filter u≠v + greatest/least + a distinct
    // exchange of the full edge set) is a no-op here and is dropped.
    // No repartition of its own: the input is largeStar's output IN THE
    // SAME PLAN (the round is one fused materialization — see the loop),
    // already u-partitioned by largeStar's final repartition+distinct,
    // so the min aggregate and the join-back are exchange-free and the
    // double reference shares largeStar's exchanges via ReuseExchange.
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("u")).agg(min(col("v")).as("m"))
      val hangNbrs = e.join(mins, Seq("u"))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      val hangSelf = mins.select(col("u"), col("m").as("v"))
      hangNbrs.unionAll(hangSelf).repartition(col("u")).distinct()
    }
    val rddsByFrame = new java.util.IdentityHashMap[DataFrame, Seq[org.apache.spark.rdd.RDD[_]]]()
    // order-independent edge-set fingerprint: read via Observation at the
    // eager checkpoint (no extra job per round)
    def checksum(e: DataFrame): (DataFrame, Long) = {
      val obs = org.apache.spark.sql.Observation()
      // bit_xor: order-independent and overflow-free (edges are distinct,
      // so xor-cancellation of repeated rows cannot occur)
      val observed = e.observe(obs,
        expr("bit_xor(xxhash64(u, v))").as("h"), count(lit(1)).as("n"))
      val (cp, rdds) = checkpointTracked(observed)
      val m = obs.get
      val h = Option(m.getOrElse("h", null)).map(_.asInstanceOf[Long]).getOrElse(0L)
      val n = Option(m.getOrElse("n", null)).map(_.asInstanceOf[Long]).getOrElse(0L)
      // returned frame keeps its tracked blocks; caller unpersists
      rddsByFrame.put(cp, rdds)
      (cp, h ^ java.lang.Long.rotateLeft(n, 32))
    }
    def release(df: DataFrame): Unit =
      Option(rddsByFrame.remove(df)).foreach(_.foreach(_.unpersist(blocking = false)))
    var (edges, sum0) = Par.labeled(pairs, "altstar: edge input") {
      checksum(pairs.select(col("a_id").as("u"), col("b_id").as("v")))
    }
    var prevSum = sum0
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // ONE materialization per round: small-star over large-star is a
      // single fused plan (large-star's output exchange is shared by
      // small-star's two references, so no intermediate checkpoint is
      // needed to avoid re-evaluation — round 14; previously each round
      // paid two checkpoint jobs and ~7 exchanges, now one job and 3).
      // Probed round 15 and REVERTED: TWO rounds per materialization
      // (clusters()' double-hop trick; the fixpoint test stays sound —
      // a checksum-stable double round that is not a single-round
      // fixpoint would be a 2-cycle of the deterministic round map,
      // which the alternating-star convergence theorem rules out)
      // measured ~2x WORSE at sf0.1 (q102 3.65→6.03 s, q142
      // 3.05→6.45 s min-of-5, interleaved): each star references its
      // input 2-3 times, so stacking four passes in one plan squares
      // the subtree copies (~36 leaf references) — ReuseExchange does
      // not dedupe them all under AQE, and the plan explodes where the
      // per-round checkpoint keeps every reference a flat scan.
      val (next, nextSum) = Par.labeled(pairs, s"altstar: round ${i + 1}") {
        checksum(smallStar(largeStar(edges)))
      }
      release(edges)
      edges = next
      converged = nextSum == prevSum
      prevSum = nextSum
      i += 1
    }
    // fixpoint edge set is a forest of stars (child → component min);
    // roots label themselves
    val labels = edges.select(col("u").as("node"), col("v").as("cluster_id"))
      .unionAll(edges.select(col("v").as("node"), col("v").as("cluster_id")))
      .groupBy(col("node")).agg(min(col("cluster_id")).as("cluster_id"))
    val (out, _) = checkpointTracked(labels)
    release(edges)
    // out's blocks back the returned frame; ContextCleaner frees them
    // when the caller drops it
    rddsByFrame.clear()
    out
  }

  /** Verify stage: exact 8-gram Jaccard for each candidate pair.
    * Each document's distinct shingle SET is materialized ONCE (the
    * `shingles8` expression), then pairs are scored with builtin array
    * ops (`array_intersect` + sizes — codegen'd). A doc in an LSH
    * bucket of size m is in up to bands×(m−1) pairs, so scoring with a
    * per-pair text expression (`jaccard8`) re-shingles every doc ~36×
    * at the default caps.
    *
    * The candidate pairs are checkpoint-materialized ONCE up front:
    * this plan references `pairs` three times (the pair list + both id
    * sides), and without the checkpoint each reference re-evaluates the
    * whole upstream subtree (for LSH input: measured 4→18 shuffles).
    * The pair set is candidate-bounded by construction — the cheap side
    * to pin. With pairs pinned, the shingle-set side is SEMI-JOINED to
    * the candidate ids, so verify cost is O(candidates), not O(corpus):
    * at 100 TB with a few million candidates, shingling the whole
    * corpus (what this replaces) would dominate the stage. The
    * checkpoint blocks back the returned frame and are released by the
    * ContextCleaner when the caller drops it. */
  def verifyCandidates(spark: SparkSession, pairs: DataFrame, docs: DataFrame,
      threshold: Double, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val cp = pairs.select(col("a_id"), col("b_id")).localCheckpoint(true)
    verifyCheckpointed(spark, cp, docs, threshold, idCol, textCol)
  }

  /** Core of `verifyCandidates` for a pair frame that is ALREADY
    * materialized (checkpointed/cached): referenced three times below,
    * so an unmaterialized input would re-evaluate its subtree per
    * reference. `dedupCorpus` calls this directly with its own tracked
    * checkpoint so the blocks can be released once components exist. */
  private def verifyCheckpointed(spark: SparkSession, cp: DataFrame, docs: DataFrame,
      threshold: Double, idCol: String, textCol: String): DataFrame =
    verifyCheckpointedTracked(spark, cp, docs, threshold, idCol, textCol)._1

  /** [[verifyCheckpointed]] handing back the RDDs behind its shingle-set
    * checkpoint so corpus pipelines (dedupCorpus, the winnow chain) can
    * free them once components are materialized. The shingle side is
    * SPREAD + materialized ONCE: unmaterialized, the a/b join branches
    * each re-ran the shingles8 pass, and a one-split corpus scan
    * serialized each run on a single task (two ~0.8 s single-task jobs
    * inside every verify at the sf0.1 bench — half the stage's wall).
    * The set is candidate-bounded (semi-joined to pair ids), so the
    * checkpoint pins O(candidates) rows, same class as the pair
    * checkpoint it sits beside. */
  private def verifyCheckpointedTracked(spark: SparkSession, cp: DataFrame,
      docs: DataFrame, threshold: Double, idCol: String, textCol: String)
      : (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
    graft.functions.Shingles8.register(spark)
    val ids = cp.select(explode(array(col("a_id"), col("b_id"))).as(idCol)).distinct()
    val (sets, setsRdds) = checkpointLazyTracked(
      Par.spread(docs.filter(col(textCol).isNotNull)
          .join(ids, Seq(idCol), "left_semi"))
        .select(col(idCol), expr(s"shingles8($textCol)").as("sh")))
    val a = sets.select(col(idCol).as("a_id"), col("sh").as("sh_a"))
    val b = sets.select(col(idCol).as("b_id"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val union = size(col("sh_a")) + size(col("sh_b")) - inter
    (cp.join(a, Seq("a_id")).join(b, Seq("b_id"))
      .withColumn("jaccard", ratio6(inter, union)) // exact 6-dp, engine-proof
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard")), setsRdds)
  }

  /** Asymmetric CONTAINMENT verification over candidate pairs: where
    * Jaccard misses a short document wholly quoted inside a long one
    * (the intersection is small relative to the UNION), containment
    * `C(A,B) = |sh(A) ∩ sh(B)| / |sh(A)|` stays high — the standard
    * quote/subset detector run beside near-dup verification. Emits
    * `(a_id, b_id, n_a, n_b, n_inter, c_ab, c_ba)` for candidate pairs
    * with `max(c_ab, c_ba) ≥ threshold`; both directions ride the same
    * shingle-set intersection, and the ratios go through the exact
    * integer 6-dp `ratio6` discipline (engine-proof).
    *
    * Scale shape: identical to [[verifyCandidates]] — the pair frame is
    * checkpointed once, both sides semi-join down to only the docs that
    * appear in a candidate pair, and the per-pair work is one
    * `array_intersect` on bounded shingle sets (positions capped at
    * [[graft.functions.MinHash48.MaxShinglePos]]). Candidate
    * generation stays whatever blocking produced `pairs` (LSH bands
    * here) — the corpus itself never joins. */
  def containment(spark: SparkSession, pairs: DataFrame, docs: DataFrame,
      threshold: Double, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    graft.functions.Shingles8.register(spark)
    val cp = pairs.select(col("a_id"), col("b_id")).localCheckpoint(true)
    val ids = cp.select(explode(array(col("a_id"), col("b_id"))).as(idCol)).distinct()
    // spread + materialize once: both ratio directions read the same
    // candidate-bounded shingle sets (see verifyCheckpointedTracked)
    val sets = Par.spread(docs.filter(col(textCol).isNotNull)
        .join(ids, Seq(idCol), "left_semi"))
      .select(col(idCol), expr(s"shingles8($textCol)").as("sh"))
      .localCheckpoint(false) // lazy: materializes once, on the first action
    val a = sets.select(col(idCol).as("a_id"), col("sh").as("sh_a"))
    val b = sets.select(col(idCol).as("b_id"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("long")
    cp.join(a, Seq("a_id")).join(b, Seq("b_id"))
      .withColumn("n_a", size(col("sh_a")).cast("long"))
      .withColumn("n_b", size(col("sh_b")).cast("long"))
      .withColumn("n_inter", inter)
      .withColumn("c_ab", ratio6(col("n_inter"), col("n_a")))
      .withColumn("c_ba", ratio6(col("n_inter"), col("n_b")))
      .filter(greatest(col("c_ab"), col("c_ba")) >= threshold)
      .select(col("a_id"), col("b_id"), col("n_a"), col("n_b"),
        col("n_inter"), col("c_ab"), col("c_ba"))
  }

  /** Sketch calibration: signature-ESTIMATED Jaccard (equal-lane
    * fraction of the two 48-bit MinHash signatures) against the TRUE
    * 8-gram Jaccard, for every LSH candidate pair — the measurement a
    * pipeline runs before trusting sketch thresholds at scale (pick the
    * verify threshold from `abs_err`'s distribution, not folklore).
    *
    * Same scale shape as the verify stage: candidate pairs checkpoint
    * ONCE (candidate-bounded), per-doc signature + shingle set
    * materialize once behind a semi-join to candidate ids — cost is
    * O(candidates), the corpus is never re-shingled per pair. The
    * estimate divides an integer lane count by k (a power of two), so
    * both engines produce the identical exact dyadic double. */
  def minhashCalibration(spark: SparkSession, docs: DataFrame,
      bands: Int = 4, maxBucket: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.functions.MinHash48.register(spark)
    graft.functions.Shingles8.register(spark)
    val (cand0, bucketRdds) = lshCandidatesTracked(
      spark, docs, bands, maxBucket, idCol, textCol)
    val cp = cand0.select(col("a_id"), col("b_id")).localCheckpoint(true)
    bucketRdds.foreach(_.unpersist(blocking = false)) // cp materialized
    val ids = cp.select(explode(array(col("a_id"), col("b_id"))).as(idCol)).distinct()
    // spread + materialize once: the a/b join branches would otherwise
    // each re-run the signature + shingle pass, serialized on a
    // one-split scan (two ~1.2 s single-task jobs at the sf0.1 bench)
    val side = Par.spread(docs.filter(col(textCol).isNotNull)
        .join(ids, Seq(idCol), "left_semi"))
      .select(col(idCol),
        expr(s"minhash48($textCol)").as("sig"),
        expr(s"shingles8($textCol)").as("sh"))
      .localCheckpoint(false) // lazy: materializes once, on the first action
    val a = side.select(col(idCol).as("a_id"),
      col("sig").as("sig_a"), col("sh").as("sh_a"))
    val b = side.select(col(idCol).as("b_id"),
      col("sig").as("sig_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val union = size(col("sh_a")) + size(col("sh_b")) - inter
    val eqLanes = expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))")
    // all three outputs derive from exact integer 6-dp numerators (the
    // ratio6 discipline): est = m·10⁶/lanes is exact (8 | 10⁶), the true
    // jaccard is half-up-rounded in integer space, and abs_err is their
    // integer difference — bit-identical across engines, no double round
    cp.join(a, Seq("a_id")).join(b, Seq("b_id"))
      .withColumn("e6", floor((eqLanes.cast("long") * lit(1000000L)).cast("double")
        / size(col("sig_a")).cast("double")).cast("long"))
      .withColumn("j6", when(union === 0, lit(1000000L)).otherwise(
        floor((inter.cast("long") * lit(2000000L) + union.cast("long")).cast("double")
          / (union.cast("long") * lit(2L)).cast("double")).cast("long")))
      .select(col("a_id"), col("b_id"),
        (col("e6").cast("double") / lit(1000000.0)).as("est_jaccard"),
        (col("j6").cast("double") / lit(1000000.0)).as("jaccard"),
        (abs(col("e6") - col("j6")).cast("double") / lit(1000000.0)).as("abs_err"))
  }

  /** Cross-source leakage matrix: for every (source, source) pair, the
    * number of VERIFIED near-dup document pairs spanning them and the
    * mean verified Jaccard — corpus governance (is source A a scrape of
    * source B? does the "clean" subset leak into the eval split?).
    *
    * Pipeline: LSH candidates → exact-Jaccard verify (both candidate-
    * bounded, see verifyCandidates) → two id→source enrich joins (the
    * source table is a 2-column projection of the corpus; the pair side
    * is candidate-bounded) → one partial-aggregable rollup on the
    * canonicalized (least, greatest) source pair. Mean Jaccard sums the
    * 6-dp-rounded pair scores as exact DECIMALs — order-free. */
  def sourceLeakage(spark: SparkSession, docs: DataFrame,
      threshold: Double = 0.2, idCol: String = "doc_id",
      srcCol: String = "source", textCol: String = "text"): DataFrame = {
    val (cand0, bucketRdds) = lshCandidatesTracked(
      spark, docs, idCol = idCol, textCol = textCol)
    val pairs = verifyCandidates(spark, cand0, docs, threshold, idCol, textCol)
    // verifyCandidates checkpointed the pair set eagerly — the
    // band-bucket blocks behind it are dead now
    bucketRdds.foreach(_.unpersist(blocking = false))
    val src = docs.select(col(idCol), col(srcCol))
    pairs
      .join(src.select(col(idCol).as("a_id"), col(srcCol).as("src_a")), Seq("a_id"))
      .join(src.select(col(idCol).as("b_id"), col(srcCol).as("src_b")), Seq("b_id"))
      .withColumn("source_1", least(col("src_a"), col("src_b")))
      .withColumn("source_2", greatest(col("src_a"), col("src_b")))
      .groupBy(col("source_1"), col("source_2"))
      .agg(
        count(lit(1)).as("n_pairs"),
        round(sum(col("jaccard").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double") / count(lit(1)).cast("double"), 6).as("mean_jaccard"))
  }

  /** One-call corpus dedup — the full four-stage pipeline: exact
    * (content hash) → minhash-LSH candidates → VERIFY (true 8-gram
    * Jaccard ≥ `verifyThreshold`) → connected components, returning the
    * surviving documents (each cluster keeps its smallest doc_id).
    *
    * The verify stage is load-bearing for precision, not a nicety:
    * connected components chain-merge, so a handful of spurious LSH
    * candidates (docs sharing one minhash band by accident) can fuse
    * unrelated clusters into super-clusters and silently over-drop —
    * observed on a 1M-doc probe corpus where skipping verification cut
    * survivors by a third. Verification cost is O(candidates), so at
    * corpus scale it is noise next to the signature pass. Set
    * `verifyThreshold = 0.0` to reproduce raw candidate-graph behavior.
    *
    * No join in the chain carries a mandatory broadcast: on realistic
    * web corpora the near-dup rate runs 30%+, so the drop set is a
    * constant fraction of the corpus and a forced broadcast would OOM
    * exactly where dedup matters most.
    *
    * `deepGraphs = true` runs the component stage with
    * `clustersAltStar` (log-round convergence on any diameter) instead
    * of label propagation — for corpora whose verified near-dup graph
    * still chains deeply (template families). Identical labels either
    * way (spec-pinned); only round counts differ. */
  def dedupCorpus(spark: SparkSession, docs: DataFrame,
      bands: Int = 4, maxBucket: Int = 10,
      idCol: String = "doc_id", textCol: String = "text",
      capMetrics: Option[org.apache.spark.sql.Observation] = None,
      verifyThreshold: Double = 0.7,
      deepGraphs: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // exact stage as a hash-partitioned window (survivor = smallest id
    // per content hash): one shuffle, NO broadcast — the survivor set
    // is corpus-sized, so collecting it to the driver cannot scale
    val w = Window.partitionBy(col("content_hash")).orderBy(col(idCol))
    // the exact-survivor set is consumed THREE times (LSH signatures,
    // the verify stage's shingle sets, the final anti join). The first
    // two run eagerly below (inside the pairs checkpoint and clusters'
    // edge materialization), so the window is persisted across them and
    // RELEASED before returning — two corpus evaluations total instead
    // of three, and no cache outlives the call (the returned plan
    // recomputes the window once on the caller's action).
    // probed round 15 and REVERTED (guide §1.2): a scale-gated spread
    // before the window — the WindowGroupLimit rewrite does put a local
    // sort of the corpus on the scan's 1-2 splits at the sf1 decade —
    // measured WORSE in an interleaved sf1 A/B (q104 4.58→6.1-6.7 s,
    // q137 5.74→6.8-7.0 s min-of-4): the round-robin exchange moves the
    // full text payload a second time, which costs more than the
    // serialized map-side sort it parallelizes (the content_hash
    // exchange already redistributes the reduce side; unlike the
    // q133/q87/q118 fixes there is no heavy per-row expression on the
    // under-split stage).
    val afterExact = docs
      .withColumn("content_hash", md5(col(textCol)))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .drop("content_hash", "rk")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // candidate pairs materialize ONCE: both the verify stage and
    // clusters() reference their input repeatedly, which would
    // re-evaluate the LSH subtree per reference and fire the cap
    // observation more than once — the checkpoint anchors everything to
    // a single execution, and the pair set is candidate-bounded (the
    // cheap side to pin). Its blocks are tracked so they can be freed
    // the moment components are materialized below.
    val (cand0, bucketRdds) = lshCandidatesTracked(
      spark, afterExact, bands, maxBucket, idCol, textCol, capMetrics)
    val (pairs, pairsRdds) = Par.labeled(docs, "dedupCorpus: exact window + LSH candidate pairs") {
      checkpointTracked(cand0)
    }
    // the pairs checkpoint just materialized — the band-bucket blocks
    // behind it are dead now
    bucketRdds.foreach(_.unpersist(blocking = false))
    // precision gate: score each candidate's TRUE shingle Jaccard and
    // keep only real near-dups before the (chain-merging) components
    val (confirmed, verifyRdds) =
      if (verifyThreshold > 0.0)
        verifyCheckpointedTracked(spark, pairs, afterExact, verifyThreshold, idCol, textCol)
      else (pairs, Seq.empty[org.apache.spark.rdd.RDD[_]])
    // the near-dup DROP set is bounded by the LSH candidate graph, which
    // on a heavily-duplicated corpus is a constant fraction of the
    // corpus — NOT broadcastable by fiat. Left unhinted: AQE broadcasts
    // at runtime when the set actually is small and degrades gracefully
    // to a shuffle join when it is not.
    // deepGraphs switches the component stage to alternating stars —
    // O(log n) rounds regardless of diameter, for corpora whose near-dup
    // graph CHAINS (template families, chunk graphs). Verified LSH
    // graphs are shallow, so label propagation stays the default.
    val dropNearDup = Par.labeled(docs, "dedupCorpus: verify + components") {
      (if (deepGraphs) clustersAltStar(spark, confirmed)
      else clusters(spark, confirmed))
    }
      .filter(col("node") =!= col("cluster_id"))
      .select(col("node").as(idCol))
    // clusters() materialized its labels with truncated lineage, so the
    // pairs + verify-set checkpoints are unreachable from the returned
    // plan — free them now instead of leaking them for the session's
    // lifetime; same for the exact-window cache (its eager consumers
    // have run)
    pairsRdds.foreach(_.unpersist(blocking = false))
    verifyRdds.foreach(_.unpersist(blocking = false))
    afterExact.unpersist(blocking = false)
    afterExact.join(dropNearDup, Seq(idCol), "left_anti")
  }

  /** One-call corpus dedup with the WINNOWING candidate generator —
    * [[dedupCorpus]]'s exact → candidates → Jaccard-verify →
    * components → anti-join pipeline with
    * [[graft.ext.TextStats.winnowCandidates]] in the candidate seat:
    * the recall-FLOOR production path (any shared ≥ w+k−1-token run
    * between two surviving docs is guaranteed a candidate pair, where
    * MinHash banding's recall is probabilistic). Every scale
    * discipline carries over unchanged: exact survivors by
    * hash-partitioned window (no driver collect), candidate pairs
    * localCheckpoint once (candidate-bounded — winnow's df cap bounds
    * per-fingerprint work at df(df−1)/2 ≤ 45 exactly like the LSH
    * bucket cap), verify is the same semi-joined shingle-set stage,
    * the drop set joins unhinted (AQE decides broadcast vs shuffle),
    * and the checkpoint + exact-window cache are freed before return.
    */
  def dedupCorpusWinnow(spark: SparkSession, docs: DataFrame,
      k: Int = 3, w: Int = 4, maxDf: Int = 10, minShared: Int = 2,
      idCol: String = "doc_id", textCol: String = "text",
      verifyThreshold: Double = 0.7,
      deepGraphs: Boolean = false): DataFrame = {
    // release BEFORE returning: a lazy consumer must not pin the
    // corpus-scale survivor cache (the consumer pays one window replay
    // instead — [[dedupCorpusWinnowTracked]] is the consume-once form
    // that keeps the cache and hands the caller the release)
    val (out, release) = dedupCorpusWinnowTracked(spark, docs, k, w,
      maxDf, minShared, idCol, textCol, verifyThreshold, deepGraphs)
    release()
    out
  }

  /** [[dedupCorpusWinnow]] with the survivor cache held until the
    * CALLER releases — the bench_sf3 census decomposition's fix, made
    * available: the untracked form unpersists the exact-dedup survivor
    * cache before returning its final anti-join (so a lazy consumer
    * cannot pin corpus-scale storage), which means the consumer's one
    * materialization REPLAYS the corpus-wide exact-dedup window — at
    * the 5M-doc decade that replay plus full-width output is most of
    * the chain's wall (BENCH_sf3.md round-14 analysis: candidates are
    * ZERO there; the wall is row/output work). This form keeps the
    * cache alive through the caller's consumption instead: consume the
    * returned frame fully (write/collect), then `release()` — the
    * [[graft.ext.Corpus.crawlIntakeTracked]] contract. One-shot jobs
    * that consume exactly once should prefer this; the untracked form
    * remains right when the result is consumed lazily/repeatedly far
    * from the call site. ScaleProbe's `winnow-tracked` arg measures
    * the delta; Ext5Spec pins result equality and the release. */
  def dedupCorpusWinnowTracked(spark: SparkSession, docs: DataFrame,
      k: Int = 3, w: Int = 4, maxDf: Int = 10, minShared: Int = 2,
      idCol: String = "doc_id", textCol: String = "text",
      verifyThreshold: Double = 0.7,
      deepGraphs: Boolean = false): (DataFrame, () => Unit) = {
    val (afterExact, _, confirmed, release) = winnowCorpusStages(spark,
      docs, k, w, maxDf, minShared, idCol, textCol, verifyThreshold)
    val dropNearDup = Par.labeled(docs, "winnowCorpus: verify + components") {
      (if (deepGraphs) clustersAltStar(spark, confirmed)
      else clusters(spark, confirmed))
    }
      .filter(col("node") =!= col("cluster_id"))
      .select(col("node").as(idCol))
    (afterExact.join(dropNearDup, Seq(idCol), "left_anti"), release)
  }

  /** [[dedupCorpusWinnow]]'s exact → candidate → verify stages, shared
    * with the pair-volume census ([[winnowCorpusPairCensus]]) so the
    * census measures the CHAIN'S OWN frames, never a replica that
    * could drift: returns (exact survivors, candidate pairs
    * [checkpointed], verified pairs, release). Callers consume the
    * frames, then `release()` (checkpoint blocks + the survivor
    * cache). */
  private def winnowCorpusStages(spark: SparkSession, docs: DataFrame,
      k: Int, w: Int, maxDf: Int, minShared: Int, idCol: String,
      textCol: String, verifyThreshold: Double)
      : (DataFrame, DataFrame, DataFrame, () => Unit) = {
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col("content_hash")).orderBy(col(idCol))
    // NO spread before the window — probed round 15, measured worse
    // (the exchange outweighs the serialized map-side sort; see
    // dedupCorpus)
    val afterExact = docs
      .withColumn("content_hash", md5(col(textCol)))
      .withColumn("rk", row_number().over(win))
      .filter(col("rk") === 1)
      .drop("content_hash", "rk")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (cand0, fpRdds) = graft.ext.TextStats.winnowCandidatesTracked(
      afterExact, k, w, maxDf, minShared, idCol, textCol)
    val (pairs, pairsRdds) = Par.labeled(docs, "winnowCorpus: exact window + winnow candidate pairs") {
      checkpointTracked(cand0.select(col("a_id"), col("b_id")))
    }
    // the pairs checkpoint just materialized — the fingerprint blocks
    // behind it are dead now
    fpRdds.foreach(_.unpersist(blocking = false))
    val (confirmed, verifyRdds) =
      if (verifyThreshold > 0.0)
        verifyCheckpointedTracked(spark, pairs, afterExact, verifyThreshold, idCol, textCol)
      else (pairs, Seq.empty[org.apache.spark.rdd.RDD[_]])
    (afterExact, pairs, confirmed, () => {
      pairsRdds.foreach(_.unpersist(blocking = false))
      verifyRdds.foreach(_.unpersist(blocking = false))
      afterExact.unpersist(blocking = false)
    })
  }

  /** Pair-volume census for the [[dedupCorpusWinnow]] chain — the
    * measurement that DECOMPOSES a scale-up reading into (pair growth
    * × per-pair cost): one row `(n_docs, n_exact_survivors,
    * n_candidates, n_verified)` counted off the chain's own stage
    * frames (shared construction, so the census cannot drift from the
    * operator). A capped chain whose wall grows faster than rows
    * should show the growth HERE (fixture pair density), with per-pair
    * cost flat — if candidates hold flat and the wall still grows, the
    * plan regressed. Used by bench_sf3's census table. */
  def winnowCorpusPairCensus(spark: SparkSession, docs: DataFrame,
      k: Int = 3, w: Int = 4, maxDf: Int = 10, minShared: Int = 2,
      idCol: String = "doc_id", textCol: String = "text",
      verifyThreshold: Double = 0.7): DataFrame = {
    import spark.implicits._
    val (afterExact, pairs, confirmed, release) = winnowCorpusStages(spark,
      docs, k, w, maxDf, minShared, idCol, textCol, verifyThreshold)
    val out = (docs.count(), afterExact.count(), pairs.count(),
      confirmed.count())
    release()
    Seq(out).toDF("n_docs", "n_exact_survivors", "n_candidates", "n_verified")
  }

  /** Chunk-level corpus dedup (the CCNet/Gopher "line dedup" shape,
    * with fixed `chunkWords`-word chunks standing in for lines): every
    * chunk whose corpus-wide occurrence count exceeds `maxReps` is
    * boilerplate (headers, navigation, license blocks) and is removed
    * from every document containing it; the per-document remainder is
    * reassembled in order. One narrow chunk explode, one partial-
    * aggregable corpus count (map-side combine collapses hot chunks
    * before the shuffle — the frequent chunk IS the skewed key, and it
    * collapses to one row per partition), then the counts are filtered
    * to the BOILERPLATE set (`reps > maxReps`) FIRST and that set is
    * broadcast back as a left-join flag — the doc-side chunk stream is
    * never shuffled on the chunk key at all, so the license block that
    * sits in 10% of the corpus costs nothing beyond its (map-side
    * combined) count row. The boilerplate set is small by construction
    * (< totalChunkOccurrences / maxReps distinct chunks, in practice
    * orders of magnitude fewer), but the broadcast is SIZE-GUARDED,
    * not assumed: the set is counted after materialization and joins
    * unhinted (AQE decides) past `maxBoilerplateBroadcast` rows —  a
    * forced hint would bypass autoBroadcastJoinThreshold and collect
    * an unbounded corpus-dependent set on the driver. Final doc-keyed
    * reassembly aggregate; chunk positions cap at 4096 per doc (the
    * shared cross-engine enumeration bound). */
  def dedupChunks(docs: DataFrame, chunkWords: Int = 2, maxReps: Int = 20,
      idCol: String = "doc_id", textCol: String = "text",
      maxBoilerplateBroadcast: Long = 1000000L): DataFrame = {
    val k = chunkWords
    val chunks = docs
      .withColumn("ws", split(col(textCol), " "))
      .select(col(idCol), posexplode(expr(
        s"""transform(sequence(0, least(int(ceil(size(ws) / CAST($k AS DOUBLE))) - 1, 4096)),
           |  i -> array_join(slice(ws, i * $k + 1, $k), ' '))""".stripMargin))
        .as(Seq("ci", "chunk")))
    // The boilerplate set is corpus-CONTENT-dependent: usually tiny
    // (< totalChunks / maxReps distinct values by construction), but a
    // pathological corpus/config (tiny chunks, low maxReps) can inflate
    // it past what a forced broadcast hint — which BYPASSES
    // autoBroadcastJoinThreshold — can collect on the driver. So the
    // set is materialized ONCE (localCheckpoint; its count aggregate
    // never re-runs, and the doc-side chunk stream still never
    // shuffles on the skewed chunk key), counted, and only broadcast
    // under `maxBoilerplateBroadcast` rows; past the bound the join
    // goes unhinted and AQE picks the strategy at runtime.
    val boilerplate = chunks.groupBy(col("chunk")).agg(count(lit(1)).as("reps"))
      .filter(col("reps") > maxReps)
      .select(col("chunk"), lit(true).as("is_boiler"))
      .localCheckpoint(true)
    val flag =
      if (boilerplate.count() <= maxBoilerplateBroadcast) broadcast(boilerplate)
      else boilerplate
    chunks.join(flag, Seq("chunk"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN is_boiler IS NULL " +
            "THEN struct(ci, chunk) END)), x -> x.chunk)"), " ").as("kept_text"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("is_boiler"), lit(1L)).otherwise(lit(0L)))
          .as("n_dropped_chunks"))
  }

  /** Incremental (cross-snapshot) dedup: drop from `newDocs` every doc
    * duplicating the EXISTING corpus — byte-exact (content-hash
    * anti-join) or near (shares a minhash band bucket with a seen doc
    * AND true 8-gram Jaccard ≥ `threshold`). The daily-increment shape:
    * candidates join new↔seen only (no within-snapshot pairs — run
    * `dedupCorpus` on the increment first for those), so incremental
    * cost is O(new + matched), never O(corpus²). The seen side's
    * signatures are recomputed here from text; the production path is
    * [[dedupIncrementalPersisted]], which reads the per-snapshot
    * artifact ([[incrementalSnapshot]] / [[writeIncrementalSnapshot]])
    * instead and never touches the seen corpus at all — the join shape
    * is identical (spec-pinned equal). Candidate pairs are checkpointed
    * (candidate-bounded) and both shingle-set sides semi-joined to
    * candidates, as in `verifyCandidates`. */
  def dedupIncremental(spark: SparkSession, newDocs: DataFrame, seenDocs: DataFrame,
      bands: Int = 4, maxBucket: Int = 10, threshold: Double = 0.7,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.functions.Shingles8.register(spark)
    // exact stage: content-hash anti-join (the seen hash set is
    // corpus-sized — unhinted, AQE picks the strategy; the three
    // consumers' replays share the seen-side exchange via
    // ReusedExchange, so the corpus-sized build is shuffled once)
    // the SEEN side is corpus-sized (unlike bandBuckets' increment-sized
    // hot path) and pays THREE per-row passes (md5, minhash, shingles) —
    // spread once, shared by all three sites (identical exchange subtree
    // → ReuseExchange). Size-gated: at sf0.1 the three serial passes are
    // ~0.25 s each and the forced exchange measured NEGATIVE (0.7 s per
    // pass at 33 tasks — shuffle machinery over text rows out-costs the
    // work it parallelizes), so the gate keeps small fixtures on the
    // no-shuffle path and fires from the sf1-class decade up, where the
    // corpus-sized pass is seconds and the exchange still ~0.3 s.
    val seen = Par.spreadIfBig(seenDocs)
    val seenHashes = seen.select(md5(col(textCol)).as("content_hash")).distinct()
    val notExact = newDocs
      .withColumn("content_hash", md5(col(textCol)))
      .join(seenHashes, Seq("content_hash"), "left_anti")
      .drop("content_hash")
    // near stage: band buckets new↔seen; degenerate seen-side buckets
    // are capped exactly like lshCandidates' (no signal, unbounded cost)
    val bN = bandBuckets(spark, notExact, bands, idCol, textCol)
      .select(col("doc_id").as("new_id"), col("band"), col("bucket"))
    val bS = bandBuckets(spark, seen, bands, idCol, textCol)
      .select(col("doc_id").as("seen_id"), col("band"), col("bucket"))
    val smallS = bS.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bsize"))
      .filter(col("bsize") <= maxBucket)
      .select(col("band"), col("bucket"))
    val cand = bN.join(bS.join(smallS, Seq("band", "bucket")), Seq("band", "bucket"))
      .select(col("new_id"), col("seen_id")).distinct()
      .localCheckpoint(true) // candidate-bounded; referenced 3× below
    val setsN = notExact.filter(col(textCol).isNotNull)
      .join(cand.select(col("new_id").as(idCol)).distinct(), Seq(idCol), "left_semi")
      .select(col(idCol).as("new_id"), expr(s"shingles8($textCol)").as("sh_n"))
    val setsS = seen.filter(col(textCol).isNotNull)
      .join(cand.select(col("seen_id").as(idCol)).distinct(), Seq(idCol), "left_semi")
      .select(col(idCol).as("seen_id"), expr(s"shingles8($textCol)").as("sh_s"))
    val inter = size(array_intersect(col("sh_n"), col("sh_s")))
    val union = size(col("sh_n")) + size(col("sh_s")) - inter
    val nearDup = cand.join(setsN, Seq("new_id")).join(setsS, Seq("seen_id"))
      .withColumn("jaccard",
        when(union === 0, lit(1.0)).otherwise(inter.cast("double") / union.cast("double")))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id").as(idCol)).distinct()
    notExact.join(nearDup, Seq(idCol), "left_anti")
  }

  /** The per-snapshot dedup-index artifact [[dedupIncrementalPersisted]]
    * consumes: one row per (non-null-text) seen doc carrying everything
    * an increment needs — `content_hash` (exact stage), the full
    * minhash `sig` (band buckets for ANY bands ≤ lane count derive from
    * it by stacking, so the artifact is bands-agnostic), and the
    * `shingles` set (true-Jaccard verify). Built in ONE narrow pass
    * over the corpus — three per-row expressions, no shuffle — and
    * written once per snapshot; every subsequent increment reads this
    * (column-pruned: hash column for the exact stage, sig for banding,
    * shingles only via a candidate-bounded semi join) and never scans
    * the corpus text again. */
  def incrementalSnapshot(spark: SparkSession, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    MinHash48.register(spark)
    graft.functions.Shingles8.register(spark)
    // spread BEFORE the three heavy per-row expressions: a one-row-group
    // corpus arrives as ONE split, and the snapshot build (this chain's
    // only corpus-sized pass) serialized on a single task — measured at
    // the 50k-doc decade as a 4.7 s one-task job holding half of q152's
    // wall while 31 cores idled. Gated on the size estimate so the
    // sf0.1-and-under fixtures keep their exchange-free plan (the
    // unconditional form regressed them — round-14 wave-1 negative);
    // at production split counts both forms are no-ops.
    Par.spreadIfBig(docs.filter(col(textCol).isNotNull))
      .select(col(idCol).as("doc_id"),
        md5(col(textCol)).as("content_hash"),
        expr(s"minhash48($textCol)").as("sig"),
        expr(s"shingles8($textCol)").as("shingles"))
  }

  /** Writes [[incrementalSnapshot]] as parquet — the once-per-snapshot
    * producer of the dedup index an increment reads back with
    * `spark.read.parquet(path)`. */
  def writeIncrementalSnapshot(spark: SparkSession, docs: DataFrame,
      path: String, idCol: String = "doc_id", textCol: String = "text"): Unit =
    incrementalSnapshot(spark, docs, idCol, textCol)
      .write.mode("overwrite").parquet(path)

  /** [[dedupIncremental]] against a PERSISTED snapshot index instead of
    * the seen corpus itself — the shape its scaladoc promises for
    * production: at 100 TB, recomputing the seen side's hashes /
    * signatures / shingles on every daily increment dwarfs the
    * increment's own cost, so the seen corpus is indexed ONCE
    * ([[writeIncrementalSnapshot]]) and each increment touches only
    * that index. Results are identical to the recomputed path
    * (spec-pinned on planted-dup corpora).
    *
    * Scan discipline: the seen TEXT is read zero times — the exact
    * stage reads the snapshot's hash column, banding stacks the
    * persisted `sig`, and the verify stage semi-joins the snapshot's
    * `shingles` column down to candidate-matched ids (O(matched), as
    * in `verifyCandidates`). Same degenerate-bucket cap, same
    * candidate checkpoint. */
  def dedupIncrementalPersisted(spark: SparkSession, newDocs: DataFrame,
      snapshot: DataFrame, bands: Int = 4, maxBucket: Int = 10,
      threshold: Double = 0.7, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    graft.functions.Shingles8.register(spark)
    val seenHashes = snapshot.select(col("content_hash")).distinct()
    val notExact = newDocs
      .withColumn("content_hash", md5(col(textCol)))
      .join(seenHashes, Seq("content_hash"), "left_anti")
      .drop("content_hash")
    val bN = bandBuckets(spark, notExact, bands, idCol, textCol)
      .select(col("doc_id").as("new_id"), col("band"), col("bucket"))
    val stack = (0 until bands).map(b => s"$b, sig[$b]").mkString(", ")
    val bS = snapshot
      .selectExpr("doc_id AS seen_id", s"stack($bands, $stack) AS (band, bucket)")
    val smallS = bS.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bsize"))
      .filter(col("bsize") <= maxBucket)
      .select(col("band"), col("bucket"))
    val cand = bN.join(bS.join(smallS, Seq("band", "bucket")), Seq("band", "bucket"))
      .select(col("new_id"), col("seen_id")).distinct()
      .localCheckpoint(true) // candidate-bounded; referenced 3× below
    // NOT spread (round-14 measured negative, both decades): the fresh
    // side's shingle pass does serialize on the one-split scan (4.3 s
    // one-task job at the 50k decade), but a repartition here loses the
    // size stats the downstream three-way join uses to broadcast, so
    // the spread reshaped it into fat shingle-array shuffles that cost
    // MORE at sf1 (8.4→9.9 s) and regressed sf0.1 (+0.4–0.7 s across
    // q103/q152/q170). At production split counts the fresh increment
    // arrives in many splits and the hazard vanishes.
    val setsN = notExact.filter(col(textCol).isNotNull)
      .join(cand.select(col("new_id").as(idCol)).distinct(), Seq(idCol), "left_semi")
      .select(col(idCol).as("new_id"), expr(s"shingles8($textCol)").as("sh_n"))
    val setsS = snapshot
      .join(cand.select(col("seen_id").as("doc_id")).distinct(), Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("seen_id"), col("shingles").as("sh_s"))
    val inter = size(array_intersect(col("sh_n"), col("sh_s")))
    val union = size(col("sh_n")) + size(col("sh_s")) - inter
    val nearDup = cand.join(setsN, Seq("new_id")).join(setsS, Seq("seen_id"))
      .withColumn("jaccard",
        when(union === 0, lit(1.0)).otherwise(inter.cast("double") / union.cast("double")))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id").as(idCol)).distinct()
    notExact.join(nearDup, Seq(idCol), "left_anti")
  }

  /** The WINNOWING counterpart of [[incrementalSnapshot]]: per seen
    * doc, content hash, the DISTINCT winnow fingerprint set (compiled
    * `winnow_keys`, fps only — positions dropped), and the shingle
    * set. Persist once per snapshot ([[writeWinnowSnapshot]]); each
    * increment then carries [[TextStats.winnow]]'s RECALL-FLOOR
    * guarantee — any new doc sharing a ≥ w+k−1-token run with a seen
    * doc WILL collide on a fingerprint — where the MinHash snapshot's
    * recall is probabilistic. */
  def winnowSnapshot(spark: SparkSession, docs: DataFrame,
      k: Int = 3, w: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.functions.WinnowKeys.register(spark, k, w)
    graft.functions.Shingles8.register(spark)
    // scale-gated spread ahead of the heavy per-row pass — see
    // incrementalSnapshot (same measured single-task hazard, same
    // sf0.1 no-op guarantee)
    Par.spreadIfBig(docs.filter(col(textCol).isNotNull))
      .select(col(idCol).as("doc_id"),
        md5(col(textCol)).as("content_hash"),
        expr(s"array_distinct(transform(winnow_keys($textCol), x -> x DIV 8192))")
          .as("fps"),
        expr(s"shingles8($textCol)").as("shingles"))
  }

  /** Writes [[winnowSnapshot]] as parquet — the once-per-snapshot
    * producer of the recall-floor dedup index. */
  def writeWinnowSnapshot(spark: SparkSession, docs: DataFrame,
      path: String, k: Int = 3, w: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): Unit =
    winnowSnapshot(spark, docs, k, w, idCol, textCol)
      .write.mode("overwrite").parquet(path)

  /** [[dedupIncrementalPersisted]] with the winnowing candidate
    * generator in the blocking seat: drop from `newDocs` every
    * byte-exact or near-duplicate of a [[winnowSnapshot]] corpus.
    * Candidates are new↔seen pairs sharing ≥ `minShared` fingerprints,
    * with boilerplate fingerprints (seen-side document frequency >
    * `maxDf`) dropped from a count aggregate BEFORE any posting list
    * materializes (q52's cap discipline); verification is the same
    * shingle-set Jaccard at `threshold` as every other dedup path.
    *
    * Scan discipline matches the MinHash twin: seen TEXT is read zero
    * times — the exact stage reads the snapshot's hash column, the
    * index join reads its persisted `fps`, and the verify stage
    * semi-joins its `shingles` down to candidate-matched ids. The new
    * side is fingerprinted in ONE narrow compiled pass. */
  def dedupIncrementalWinnow(spark: SparkSession, newDocs: DataFrame,
      snapshot: DataFrame, maxDf: Int = 10, minShared: Int = 2,
      threshold: Double = 0.7, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 3, w: Int = 4): DataFrame = {
    val (notExact, _, scored) = incrementalWinnowStages(spark, newDocs,
      snapshot, maxDf, minShared, idCol, textCol, k, w)
    val nearDup = scored.filter(col("jaccard") >= threshold)
      .select(col("new_id").as(idCol)).distinct()
    notExact.join(nearDup, Seq(idCol), "left_anti")
  }

  /** [[dedupIncrementalWinnow]]'s exact → candidate → verify stages,
    * shared with [[winnowIncrementalPairCensus]] (same construction →
    * the census cannot drift from the operator): returns (exact
    * survivors, candidate pairs [checkpointed, candidate-bounded],
    * scored pairs with their exact `jaccard`). */
  private def incrementalWinnowStages(spark: SparkSession,
      newDocs: DataFrame, snapshot: DataFrame, maxDf: Int, minShared: Int,
      idCol: String, textCol: String, k: Int, w: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    // (k, w) must match what the snapshot was fingerprinted with
    // (winnowSnapshot's arguments) — the persisted-directory form
    // reads them from the index itself (readWinnowIndexParams)
    graft.functions.WinnowKeys.register(spark, k, w)
    graft.functions.Shingles8.register(spark)
    val seenHashes = snapshot.select(col("content_hash")).distinct()
    val notExact = newDocs
      .withColumn("content_hash", md5(col(textCol)))
      .join(seenHashes, Seq("content_hash"), "left_anti")
      .drop("content_hash")
    val fpN = notExact.filter(col(textCol).isNotNull)
      .select(col(idCol).as("new_id"), explode(expr(
        s"array_distinct(transform(winnow_keys($textCol), x -> x DIV 8192))"))
        .as("fp"))
    val fpS = snapshot.select(col("doc_id").as("seen_id"),
      explode(col("fps")).as("fp"))
    val smallS = fpS.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("fp"))
    val cand = fpN.join(fpS.join(smallS, Seq("fp")), Seq("fp"))
      .groupBy(col("new_id"), col("seen_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("new_id"), col("seen_id"))
      .localCheckpoint(true) // candidate-bounded; referenced 3× below
    // NOT spread — same measured negative as dedupIncrementalPersisted
    // (see there): the repartition's stats loss reshaped the scoring
    // join into fat shingle shuffles, worse at both decades
    val setsN = notExact.filter(col(textCol).isNotNull)
      .join(cand.select(col("new_id").as(idCol)).distinct(), Seq(idCol), "left_semi")
      .select(col(idCol).as("new_id"), expr(s"shingles8($textCol)").as("sh_n"))
    val setsS = snapshot
      .join(cand.select(col("seen_id").as("doc_id")).distinct(), Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("seen_id"), col("shingles").as("sh_s"))
    val inter = size(array_intersect(col("sh_n"), col("sh_s")))
    val union = size(col("sh_n")) + size(col("sh_s")) - inter
    val scored = cand.join(setsN, Seq("new_id")).join(setsS, Seq("seen_id"))
      .withColumn("jaccard",
        when(union === 0, lit(1.0)).otherwise(inter.cast("double") / union.cast("double")))
    (notExact, cand, scored)
  }

  /** Pair-volume census for the [[dedupIncrementalWinnow]] chain —
    * [[winnowCorpusPairCensus]]'s decomposition for the increment
    * shape: one row `(n_new, n_exact_survivors, n_candidates,
    * n_verified)` counted off the chain's own stage frames. */
  def winnowIncrementalPairCensus(spark: SparkSession, newDocs: DataFrame,
      snapshot: DataFrame, maxDf: Int = 10, minShared: Int = 2,
      threshold: Double = 0.7, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 3, w: Int = 4): DataFrame = {
    import spark.implicits._
    val (notExact, cand, scored) = incrementalWinnowStages(spark, newDocs,
      snapshot, maxDf, minShared, idCol, textCol, k, w)
    Seq((newDocs.count(), notExact.count(), cand.count(),
      scored.filter(col("jaccard") >= threshold).count()))
      .toDF("n_new", "n_exact_survivors", "n_candidates", "n_verified")
  }

  /** The DIRECTORY form of the winnow index: `path/docs` =
    * [[winnowSnapshot]] (hash + fps + shingles per seen doc) and
    * `path/fpdf` = the fingerprint document-frequency table, computed
    * ONCE at index time. The df table is what lets increments apply
    * the boilerplate cap without re-aggregating the posting table per
    * increment ([[dedupIncrementalWinnowIndexed]]) — at a 10M-doc
    * index the per-increment df recount was the dominant O(seen)
    * shuffle (ScaleProbe: 70s/increment, near-linear in index size). */
  def writeWinnowIndex(spark: SparkSession, docs: DataFrame,
      path: String, k: Int = 3, w: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val snap = winnowSnapshot(spark, docs, k, w, idCol, textCol)
    snap.write.mode("overwrite").parquet(s"$path/docs")
    spark.read.parquet(s"$path/docs")
      .select(explode(col("fps")).as("fp"))
      .groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$path/fpdf")
    // the winnowing parameters are PART OF the index: fingerprints
    // selected at (k, w) only match fingerprints selected at the same
    // (k, w), so increments must read them from the directory rather
    // than trust the caller to repeat them (a mismatch silently KEEPS
    // near-duplicates — no error ever surfaces)
    import spark.implicits._
    Seq((k, w)).toDF("k", "w").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** The (k, w) a [[writeWinnowIndex]] directory was built with —
    * read from `path/meta`. Indexes written before the meta table
    * existed default to (3, 4), the historical fixed binding. */
  def readWinnowIndexParams(spark: SparkSession, path: String): (Int, Int) = {
    val p = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val r = spark.read.parquet(s"$path/meta").head()
      (r.getAs[Int]("k"), r.getAs[Int]("w"))
    } else (3, 4)
  }

  /** Combine two [[writeWinnowIndex]] directories built over DISJOINT
    * document shards into one index over their union, WITHOUT
    * re-reading a single document — the roll-up property the sketch
    * merges pin for HLL/CMS (q161/q162), applied to the winnow index:
    * per-shard / per-day crawl indexes combine into the corpus index
    * by metadata-scale arithmetic alone.
    *  - `docs`: shards hold disjoint doc sets, so the snapshot tables
    *    simply UNION (no doc is re-fingerprinted);
    *  - `fpdf`: a fingerprint's document frequency over a disjoint
    *    union is the SUM of its per-shard frequencies — one
    *    fp-keyed aggregate over two |distinct fp|-bounded tables;
    *  - `meta`: (k, w) must MATCH (fingerprints selected at different
    *    parameters never co-match; merging them would silently miss
    *    near-duplicates), enforced here, carried to the output.
    * Equivalence contract (Ext5Spec + q163 share q152's oracle):
    * increments against the merged index are bit-equal to increments
    * against an index built over the union in one pass. */
  def mergeWinnowIndexes(spark: SparkSession, a: String, b: String,
      out: String, pruneDf: Int = Int.MaxValue): Unit = {
    val (ka, wa) = readWinnowIndexParams(spark, a)
    val (kb, wb) = readWinnowIndexParams(spark, b)
    require(ka == kb && wa == wb,
      s"winnow param mismatch: ($ka,$wa) at $a vs ($kb,$wb) at $b — " +
        "indexes built at different (k, w) cannot merge")
    // effective prune cap: the tightest of this call's and both
    // inputs' (a previously-pruned input's missing fps were dropped
    // at ITS cap — claiming a looser cap would resurrect nothing and
    // silently promise df fidelity the table no longer has)
    val eff = math.min(pruneDf,
      math.min(readWinnowPruneDf(spark, a), readWinnowPruneDf(spark, b)))
    spark.read.parquet(s"$a/docs")
      .unionByName(spark.read.parquet(s"$b/docs"))
      .write.mode("overwrite").parquet(s"$out/docs")
    val summed = spark.read.parquet(s"$a/fpdf")
      .unionByName(spark.read.parquet(s"$b/fpdf"))
      .groupBy(col("fp")).agg(sum(col("df")).as("df"))
    if (eff == Int.MaxValue) {
      summed.write.mode("overwrite").parquet(s"$out/fpdf")
    } else {
      // over-cap fps are dead weight every future increment re-filters
      // (df > eff ≥ any legal maxDf ⇒ the increment drops them anyway —
      // a missing fpdf row and a filtered one are the same verdict).
      // They leave a TOMBSTONE (fp only) so CHAINED merges stay sound:
      // summing a pruned side's dfs would otherwise UNDERCOUNT a
      // tombstoned fp that reappears in the other shard (df_b alone
      // instead of df_a + df_b) and quietly re-activate a boilerplate
      // fingerprint the one-pass index would cap.
      val tombstoned = readWinnowTombstones(spark, a)
        .unionByName(readWinnowTombstones(spark, b)).distinct()
      // checkpointed because referenced twice (fpdf + pruned writes);
      // distinct-fp scale, so release the backing blocks once both
      // consumers finish — Dataset.unpersist is a no-op for
      // localCheckpoint blocks (COVERAGE.md), only the RDD path frees.
      val (cleaned, cleanedRdds) = checkpointTracked(summed
        .join(broadcast(tombstoned), Seq("fp"), "left_anti"))
      cleaned.filter(col("df") <= eff)
        .write.mode("overwrite").parquet(s"$out/fpdf")
      cleaned.filter(col("df") > eff).select(col("fp"))
        .unionByName(tombstoned).distinct()
        .write.mode("overwrite").parquet(s"$out/pruned")
      cleanedRdds.foreach(_.unpersist(blocking = false))
    }
    import spark.implicits._
    Seq((ka, wa, eff)).toDF("k", "w", "prune_df").coalesce(1)
      .write.mode("overwrite").parquet(s"$out/meta")
  }

  /** The prune cap a winnow index was merged with (`prune_df` in
    * `path/meta`) — Int.MaxValue (no pruning) for indexes written
    * before the column existed or never pruned. Consumers must use
    * `maxDf ≤ prune_df`: a looser cap would need the pruned rows. */
  def readWinnowPruneDf(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Int.MaxValue
    val df = spark.read.parquet(s"$path/meta")
    if (!df.columns.contains("prune_df")) Int.MaxValue
    else df.head().getAs[Int]("prune_df")
  }

  /** Tombstoned (pruned-over-cap) fingerprints of a merged index —
    * empty for unpruned indexes. Bounded: an fp tombstones only when
    * df > prune_df, so |tombstones| ≤ postings / prune_df. */
  private def readWinnowTombstones(spark: SparkSession,
      path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$path/pruned")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(s"$path/pruned").select(col("fp"))
    else {
      import spark.implicits._
      Seq.empty[Long].toDF("fp")
    }
  }

  /** [[dedupIncrementalWinnow]] against a persisted [[writeWinnowIndex]]
    * directory — IDENTICAL result (spec-pinned), restructured so every
    * seen-side table is only ever SCANNED, never shuffled or
    * re-aggregated. Increment cost is O(index scan + matches), flat in
    * everything but the columnar read itself:
    *  - exact stage: the seen hash column is semi-joined down by the
    *    BROADCAST new-side hash set (the q103/bloom join-order
    *    discipline — left_anti can only broadcast-build right, so a
    *    naive anti-join would shuffle the 10M-hash seen side);
    *  - boilerplate cap: the new side's fingerprints pick up their
    *    seen-side df from the PERSISTED `fpdf` table (broadcast new
    *    side into a scan) — no per-increment recount, and over-cap fps
    *    die on the NEW side before a single posting expands;
    *  - candidate join: the kept new-side fingerprints broadcast into
    *    one scan of the posting table.
    * Increments are broadcast-sized by definition (a daily crawl batch,
    * not a corpus); for a mega-increment fall back to
    * [[dedupIncrementalWinnow]], whose joins shuffle both sides. */
  def dedupIncrementalWinnowIndexed(spark: SparkSession, newDocs: DataFrame,
      path: String, maxDf: Int = 10, minShared: Int = 2,
      threshold: Double = 0.7, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // the new side MUST fingerprint at the index's own (k, w) — read
    // from path/meta, never assumed (a silent mismatch keeps
    // near-duplicates with no error raised)
    val (k, w) = readWinnowIndexParams(spark, path)
    val pruneDf = readWinnowPruneDf(spark, path)
    require(maxDf <= pruneDf,
      s"maxDf=$maxDf exceeds the index's prune cap $pruneDf at $path — " +
        "fps with df in (prune_df, maxDf] were pruned at merge time; " +
        "re-merge with a looser pruneDf to use this maxDf")
    graft.functions.WinnowKeys.register(spark, k, w)
    graft.functions.Shingles8.register(spark)
    val snapshot = spark.read.parquet(s"$path/docs")
    val fpdf = spark.read.parquet(s"$path/fpdf")
    val newHashed = newDocs.withColumn("content_hash", md5(col(textCol)))
    val newHashes = newHashed.select(col("content_hash")).distinct()
    val seenMatched = snapshot.select(col("content_hash"))
      .join(broadcast(newHashes), Seq("content_hash"), "left_semi")
      .distinct()
    val notExact = newHashed
      .join(broadcast(seenMatched), Seq("content_hash"), "left_anti")
      .drop("content_hash")
    // (probed round 14: spreading this 1-task winnow pass measured
    // SLOWER — fpN feeds a broadcast build, and a shuffle inside the
    // build's stage chain costs more than the 0.8 s pass it splits)
    val fpN = notExact.filter(col(textCol).isNotNull)
      .select(col(idCol).as("new_id"), explode(expr(
        s"array_distinct(transform(winnow_keys($textCol), x -> x DIV 8192))"))
        .as("fp"))
    // seen-side df rides the persisted table: fps the seen corpus never
    // produced are dropped (they cannot match a posting), over-cap fps
    // are dropped BEFORE any posting expands
    val fpNkept = fpdf.join(broadcast(fpN), Seq("fp"))
      .filter(col("df") <= maxDf)
      .select(col("new_id"), col("fp"))
    val postings = snapshot.select(col("doc_id").as("seen_id"),
      explode(col("fps")).as("fp"))
    val cand = postings.join(broadcast(fpNkept), Seq("fp"))
      .groupBy(col("new_id"), col("seen_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("new_id"), col("seen_id"))
      .localCheckpoint(true) // candidate-bounded; referenced 3× below
    val setsN = notExact.filter(col(textCol).isNotNull)
      .join(cand.select(col("new_id").as(idCol)).distinct(), Seq(idCol), "left_semi")
      .select(col(idCol).as("new_id"), expr(s"shingles8($textCol)").as("sh_n"))
    val setsS = snapshot
      .join(broadcast(cand.select(col("seen_id").as("doc_id")).distinct()),
        Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("seen_id"), col("shingles").as("sh_s"))
    val inter = size(array_intersect(col("sh_n"), col("sh_s")))
    val union = size(col("sh_n")) + size(col("sh_s")) - inter
    val nearDup = cand.join(setsN, Seq("new_id")).join(setsS, Seq("seen_id"))
      .withColumn("jaccard",
        when(union === 0, lit(1.0)).otherwise(inter.cast("double") / union.cast("double")))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id").as(idCol)).distinct()
    notExact.join(nearDup, Seq(idCol), "left_anti")
  }

  /** Corpus-level overlap estimate between two document sets (split by
    * the `inA` predicate) from aggregate MinHash sketches: each side's
    * corpus signature lane is the min hash over ALL its shingles —
    * exactly the min over per-doc minhash lanes, so it folds into one
    * partial-aggregable pass — and the Jaccard of the two corpus
    * shingle SETS is estimated by the fraction of equal lanes. The
    * dataset-drift / cross-corpus-contamination smell test at any
    * scale: one narrow pass, an 8-key aggregate, a 1-row reduce;
    * estimate granularity is 1/8 with the shared salt contract (wire
    * more salts through `minhashSignatures` for finer estimates). */
  def corpusOverlap(spark: SparkSession, docs: DataFrame,
      inA: org.apache.spark.sql.Column, textCol: String = "text"): DataFrame = {
    MinHash48.register(spark)
    val lanes = docs.filter(col(textCol).isNotNull)
      .select(inA.as("in_a"), expr(s"minhash48($textCol)").as("sig"))
      .select(col("in_a"), posexplode(col("sig")).as(Seq("lane", "h")))
      .groupBy(col("lane"))
      .agg(min(when(col("in_a"), col("h"))).as("min_a"),
        min(when(!col("in_a"), col("h"))).as("min_b"))
    lanes.agg(
      count(lit(1)).as("n_lanes"),
      sum(when(col("min_a") === col("min_b"), lit(1L)).otherwise(lit(0L)))
        .as("n_equal"))
      .withColumn("j_estimate",
        round(col("n_equal").cast("double") / col("n_lanes"), 6))
  }

  /** Bloom-accelerated exact incremental dedup: drop from `newDocs`
    * every byte-exact duplicate of the seen corpus, with the anti-join
    * replaced by a two-stage bloom prefilter + confirm join. Result is
    * IDENTICAL to the plain content-hash anti-join (spec-pinned): the
    * bloom has no false negatives, so every true duplicate reaches the
    * confirm join, and the confirm join removes the false positives.
    *
    * Why at scale: the plain anti-join shuffles the ENTIRE new snapshot
    * against the seen hash set. Here the new side is cut by a NARROW
    * broadcast-bloom predicate first — survivors of the prefilter are
    * (true dups + fpp·|new|), typically orders of magnitude smaller —
    * and the confirm joins are ordered so the candidate-hash set is the
    * broadcast build side against a bare SCAN of the seen hashes:
    * neither the increment nor the seen corpus is ever shuffled. The
    * seen side is one projection scan (hash column only); the bloom
    * itself is built once
    * per snapshot with a driver treeAggregate and costs
    * ~1.2 bytes·ln(1/fpp) per seen doc (≈1.2 GB at 10⁹ docs, 1% fpp) —
    * fine on a cluster driver, and reusable across increments where a
    * production deployment persists it alongside the snapshot.
    *
    * `expectedSeen` sizes the filter; overshooting wastes memory,
    * undershooting inflates the realized fpp (never correctness). */
  def dedupIncrementalExactBloom(spark: SparkSession, newDocs: DataFrame,
      seenDocs: DataFrame, expectedSeen: Long = 1000000L, fpp: Double = 0.01,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val seenHashes = seenDocs.select(md5(col(textCol)).as("content_hash"))
    val bf = seenHashes.stat.bloomFilter("content_hash", expectedSeen, fpp)
    // the probe is a compiled reference-object expression
    // (graft.functions.BloomProbe — BloomDecontam's pattern), not a
    // ScalaUDF: the prefilter stays inside whole-stage codegen and
    // rides the increment scan for free (byte-identical verdicts —
    // mightContainBinary over the UTF-8 bytes IS mightContainString)
    graft.functions.BloomProbe.register(spark,
      new graft.functions.BloomFilterRef(bf))
    val hashed = newDocs.withColumn("content_hash", md5(col(textCol)))
    // candidates = bloom-positive rows only (narrow predicate, no shuffle)
    val candidates = hashed.filter(expr("bloom_might_contain(content_hash)"))
    // confirm: false positives are NOT real dups — keep them. Join ORDER
    // matters at scale: a direct `candidates SEMI seen` puts the
    // corpus-sized seen set on the build side (left-semi can only
    // broadcast-build RIGHT), forcing a full-corpus shuffle per
    // increment. Instead the seen side is narrowly FILTERED by the small
    // candidate-hash set first (AQE broadcast-builds the right side),
    // and only the tiny matched set is deduplicated and joined back —
    // the seen corpus is scanned once, shuffled never.
    val candHashes = candidates.select(col("content_hash")).distinct()
    val seenMatched = seenHashes
      .join(candHashes, Seq("content_hash"), "left_semi")
      .distinct()
    val confirmed = candidates
      .join(seenMatched, Seq("content_hash"), "left_semi")
      .select(col(idCol))
    hashed.join(confirmed, Seq(idCol), "left_anti").drop("content_hash")
  }

  /** 16-bit SimHash per document over whitespace words, via the custom
    * codegen'd `simhash16` expression (graft.functions.SimHash16): the
    * hash is a pure per-row function of the text, so the plan is fully
    * NARROW — no word explode, no vote aggregate, no shuffle at all.
    * Bit-identical to the relational form (kept below for the
    * equivalence spec and as the oracle's shape). */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.functions.SimHash16.register(docs.sparkSession)
    // null text dropped — parity with the relational form + oracle
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), expr(s"simhash16($textCol)").as("simhash"))
  }

  /** Relational SimHash (explode words → one aggregate with 16
    * partial-aggregable vote sums) — the formulation the DuckDB oracle
    * mirrors; pinned equal to the expression form by ExtApiSpec. */
  def simhashRelational(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val words = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("w"))
      .withColumn("h", conv(substring(md5(col("w")), 1, 4), 16, 10).cast("long"))
    val votes = (0 until 16).map { b =>
      sum(when(expr(s"(h DIV ${1L << b}) % 2") === 1, lit(1L))
        .otherwise(lit(-1L))).as(s"v$b")
    }
    words.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 16).map(b =>
          when(col(s"v$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Four independent 16-bit SimHash lanes per document (the banded
    * layout of Manku, Jindal & Sarawagi, "Detecting near-duplicates for
    * web crawling", WWW'07) via the codegen'd `simhash64` expression —
    * fully narrow, one md5 per word feeding all lanes. Lane 0 is
    * bit-identical to [[simhash]]. */
  def simhashLanes(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    graft.functions.SimHash64.register(docs.sparkSession)
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), expr(s"simhash64($textCol)").as("lanes"))
  }

  /** SimHash Hamming near-dup search on the CHEAP 64-bit signature:
    * banding over the four 16-bit lanes (exact lane match on ≥1 band →
    * candidate), then exact Hamming verification
    * `Σ bit_count(lane_a XOR lane_b) <= maxDist`.
    *
    * WHICH FORM TO USE: [[simhashNearDup128]] is the documented
    * DEFAULT for corpus-wide near-dup — its 32-bit band space never
    * saturates (measured returning the exact planted pair set at 20M
    * signatures, the decade where this form must gate off), at the
    * cost of one extra packed long per row. THIS form is the
    * cheap-signature option: below ~4M documents the two produce the
    * same recall discipline and this one shuffles a third less per
    * row.
    *
    * Pigeonhole guarantee: any pair within Hamming distance ≤ 3 (=
    * bands−1) differs in at most 3 of the 64 bits, so at least one of
    * the 4 lanes matches exactly — banding finds ALL such pairs, up to
    * the `maxBucket` degenerate-bucket cap (same skew discipline as
    * [[lshCandidates]]: bucket sizes come from a count aggregate and
    * mega-buckets are dropped BEFORE any id list materializes).
    *
    * Scale shape: the lane arrays ride INSIDE the bucket aggregate
    * (≤ maxBucket structs of 4 longs each), so verification needs no
    * join back against the corpus-sized signature table — candidate
    * pairs come out of the bucket expansion already carrying both
    * signatures, and the Hamming check is a narrow filter.
    *
    * The cap is not silent (OP-A5 discipline, same contract as
    * [[lshCandidates]]): pass `capMetrics` (an `Observation`) to read
    * `dropped_buckets` / `dropped_doc_slots` after the first action on
    * the result; use [[simhashCapStats]] when an always-exact answer is
    * required (AQE empty-relation propagation can erase the observed
    * subtree when every bucket is capped).
    *
    * `maxBucket` DEFAULTS TO 0 = census-derived ([[hammingNearDup64]]'s
    * in-plan derivation — ScaleProbe measured the old fixed default
    * sitting below the MEAN bucket size at 2M signatures, silently
    * keeping ~4% of true pairs); pass an explicit cap to pin it.
    * Past ~4M documents the 4×16-bit band space saturates (see
    * [[hammingNearDup64]]'s SCALE BOUNDARY note) — corpus-wide runs at
    * that size belong on [[simhashNearDup128]], whose 32-bit bands
    * keep pruning at any feasible corpus. */
  def simhashNearDup(spark: SparkSession, docs: DataFrame, maxDist: Int = 3,
      maxBucket: Int = 0, idCol: String = "doc_id",
      textCol: String = "text",
      capMetrics: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    // spread BEFORE the per-word md5 vote pass (Par.spread): the
    // signature expression is the corpus-sized cost of this operator
    val lanes = simhashLanes(Par.spreadIfBig(docs), idCol, textCol)
    // the four 16-bit lanes PACK into one long (disjoint bit ranges),
    // so Σ per-lane bit_count(xor) == ONE bit_count over the packed
    // xor, and every shuffled row / collected member carries 2 flat
    // longs instead of doc_id + a 4-long array (measured at sf1:
    // 4.28s → the packed form shaves the lane-bucket aggregate that
    // round 7 flagged at 2.05× DuckDB). shiftleft/| are bitwise (no
    // ANSI overflow on lane3's high bit); band extraction masks the
    // arithmetic shift back to 16 bits, so bval == lanes[band] exactly.
    val packed = lanes.select(col("doc_id"),
      expr("lanes[0] | shiftleft(lanes[1], 16) | shiftleft(lanes[2], 32)" +
        " | shiftleft(lanes[3], 48)").as("packed"))
      // LAZY checkpoint: hammingNearDup64 references its input twice
      // (bucket census + id-collecting join-back) under different
      // projections — ReuseExchange never dedupes them, so without this
      // the per-word signature pass runs twice per action. Two flat
      // longs per row; materialized by the first action, no extra job.
      // NOT scale-gated — the round-15 gating probe measured worse at
      // sf0.1 too (see lshCandidatesTracked).
      .localCheckpoint(false)
    hammingNearDup64(spark, packed, maxDist, maxBucket, capMetrics)
  }

  /** Hamming near-dup search over ANY packed 64-bit signature column —
    * [[simhashNearDup]]'s banding/verify machinery factored to its
    * real input contract `(doc_id, packed)`, so non-text signatures
    * (perceptual image hashes — [[graft.multimodal.Multimodal
    * .imageHashes]]' dHash/aHash — or any caller-computed 64-bit
    * sketch) reuse it verbatim. Semantics, caps, observability and the
    * physical plan are exactly simhashNearDup's: 4×16-bit band split,
    * exact lane match on ≥1 band → candidate (pigeonhole-complete for
    * distance ≤ 3), mega-buckets dropped pre-collect at `maxBucket`
    * with observable drop stats, exact `bit_count(xor)` verification,
    * one row per pair.
    *
    * `maxBucket = 0` (the DEFAULT) derives the cap from the census the
    * filter already computes — [[deriveHammingCap]]'s rule (10 × the
    * mean per-band bucket occupancy, floor 10) evaluated IN-PLAN: the
    * corpus total is a global window sum over the metadata-scale
    * census (≤ 4·2¹⁶ rows — one window partition is fine), so
    * derivation adds no job and no second corpus scan and stays lazy.
    * (BATCH only: the global non-time window is rejected by streaming
    * analysis — a streaming caller must pass an explicit cap or use
    * [[graft.streaming.Streams.hammingIntake]], which derives the cap
    * driver-side from the persisted census.) The fixed default it
    * replaces was a measured recall scale-killer: at 2M signatures the
    * MEAN band bucket holds ~30 members, so cap 10 sat below the mean
    * and kept ~4% of true pairs (band-space saturation — ScaleProbe's
    * `hamming-intake` census). An explicit cap still applies verbatim
    * (floor 1); the drop stats always report against the cap in
    * effect.
    *
    * SCALE BOUNDARY (~4M signatures): the derived cap tracks the mean
    * bucket (10 × n/2¹⁶), so it is deliberately UNBOUNDED — and past
    * ~4M signatures the 16-bit band space itself saturates: kept pair
    * volume grows as Σc² ≈ n²/2¹⁶ per band (at 20M sigs the mean
    * bucket holds ~305 members — tens of billions of candidate pairs;
    * ScaleProbe gates its corpus-wide row off there for exactly this
    * reason). Above that, corpus-wide dedup belongs on the 32-bit-band
    * machinery — [[hammingNearDup128]] / [[simhashNearDup128]], whose
    * band space (2³²) does not saturate at any feasible corpus — or on
    * the increment-bounded [[hammingIntake]]; an explicit cap bounds
    * the work but reintroduces the measured recall loss. */
  def hammingNearDup64(spark: SparkSession, packedDf: DataFrame,
      maxDist: Int = 3, maxBucket: Int = 0,
      capMetrics: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    requirePigeonhole(maxDist)
    require(maxBucket >= 0,
      s"maxBucket=$maxBucket must be >= 1, or 0 to derive from the census")
    val packed = packedDf.select(col("doc_id"), col("packed"))
    val buckets = hammingBands(packed)
    val sized0 = withHammingCap(
      buckets.groupBy(col("band"), col("bval"))
        .agg(count(lit(1)).as("bsize")), maxBucket)
    val sized = capMetrics.fold(sized0)(o => sized0.observe(o,
      sum(when(col("bsize") > col("_cap"), lit(1L)).otherwise(lit(0L)))
        .as("dropped_buckets"),
      sum(when(col("bsize") > col("_cap"), col("bsize")).otherwise(lit(0L)))
        .as("dropped_doc_slots")))
    val small = sized
      .filter(col("bsize").between(lit(2), col("_cap")))
      .select(col("band"), col("bval"))
    buckets.join(small, Seq("band", "bval")) // mega-buckets die pre-collect
      .groupBy(col("band"), col("bval"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("packed")))).as("ms"))
      .select(explode(expr(
        """flatten(transform(ms, (x, i) ->
          |  transform(slice(ms, i + 2, size(ms)), y ->
          |    struct(x.doc_id AS a_id, y.doc_id AS b_id,
          |           x.packed AS pa, y.packed AS pb))))""".stripMargin)).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"),
        expr("CAST(bit_count(p.pa ^ p.pb) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct() // a pair sharing several bands appears once per band
  }

  /** Reject a `maxDist` the FOUR-band pigeonhole cannot serve: with 4
    * bands, a true pair is guaranteed to agree exactly on ≥ 1 band only
    * when its differing bits number ≤ 3 (= bands − 1) — at maxDist 4+ a
    * pair whose differing bits land one per band shares NO band and is
    * SILENTLY dropped, a recall hole no cap diagnostic would surface.
    * Every 4-band entry point (64- and 128-bit near-dup, the persisted
    * intakes, the stream twins) calls this instead of quietly degrading;
    * a wider radius needs a different bander (maxDist + 1 bands), not a
    * bigger parameter. */
  private[graft] def requirePigeonhole(maxDist: Int): Unit =
    require(maxDist >= 0 && maxDist <= 3,
      s"maxDist=$maxDist outside [0, 3]: 4-band LSH is pigeonhole-complete " +
        "only for Hamming <= 3 — larger radii would silently lose recall " +
        "(pairs whose differing bits span all four bands share no band)")

  /** The 4×16-bit band rows of a packed-64 signature frame —
    * `(doc_id, packed, band, bval)`, the shared narrow generator
    * behind [[hammingNearDup64]]'s bucketing and the persisted-index
    * forms below. */
  private[graft] def hammingBands(packedDf: DataFrame): DataFrame =
    packedDf.select(col("doc_id"), col("packed"),
      posexplode(expr(BandLanesSql)).as(Seq("band", "bval")))

  /** The per-row 4×16-bit lane array of a `packed` long — ONE spelling
    * shared by [[hammingBands]] and the stream probes
    * ([[graft.streaming.Streams]]): stream/batch band parity is a
    * bit-exact contract, so the expression must not exist twice. */
  private[graft] val BandLanesSql: String =
    "transform(sequence(0, 3), i -> shiftright(packed, i * 16) & 65535)"

  /** Attach the effective bucket cap as a `_cap` column to a
    * `(band, bval, bsize)` census frame: a literal for an explicit
    * `maxBucket`, or — for `maxBucket = 0` — [[deriveHammingCap]]'s
    * exact integer rule computed IN-PLAN (total signatures =
    * Σ bsize / 4 via a global window; the census is metadata-scale,
    * ≤ 4·2¹⁶ rows, so the single window partition costs nothing).
    * Keeping derivation inside the plan means the derived-cap path
    * stays as lazy as the explicit one — no extra job, no checkpoint,
    * and the census is still computed exactly once. */
  private def withHammingCap(census: DataFrame, maxBucket: Int): DataFrame =
    if (maxBucket == 0)
      census.withColumn("_tot", sum(col("bsize")).over())
        .withColumn("_cap",
          expr("greatest(10L, 10L * ((_tot DIV 4 + 65535) DIV 65536))"))
        .drop("_tot")
    else census.withColumn("_cap", lit(maxBucket.toLong))

  /** 128-bit SimHash lanes per doc — `(doc_id, lanes)` with eight
    * 16-bit lanes ([[graft.functions.SimHash128]]; lanes 0–3 ≡
    * `simhash64`'s). Null text drops (no signature to compare). */
  def simhashLanes128(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    graft.functions.SimHash128.register(docs.sparkSession)
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), expr(s"simhash128($textCol)").as("lanes"))
  }

  /** 128-bit SimHash Hamming near-dup — THE corpus-wide batch
    * entry point (the documented default; [[simhashNearDup]] is the
    * cheap-signature option for sub-4M corpora): [[simhashNearDup]]'s
    * banding/verify discipline on a 128-bit signature with FOUR
    * 32-BIT bands.
    * Pigeonhole completeness is unchanged (any pair within Hamming ≤ 3
    * = bands − 1 agrees exactly on ≥ 1 band), but the bucket space per
    * band is 2³² instead of 2¹⁶ — the mean bucket holds n/2³² members,
    * below ONE until the corpus passes four billion documents, so the
    * band space never saturates and the kept pair volume stays
    * ∝ the true duplicate structure, not n²/bucket-space (the measured
    * ~4M-signature cliff of the 64-bit form — see
    * [[hammingNearDup64]]'s SCALE BOUNDARY note; ScaleProbe's
    * `hamming128` census measures this shape returning the full
    * planted pair set at 20M signatures, where the 64-bit batch row
    * gates off).
    *
    * Distance semantics: `maxDist` applies to the 128-bit signature —
    * a strictly FINER similarity test than the same distance on 64
    * bits (twice the bits must agree), which is the point: wider
    * signatures buy precision AND scale together. */
  def simhashNearDup128(spark: SparkSession, docs: DataFrame,
      maxDist: Int = 3, maxBucket: Int = 0, idCol: String = "doc_id",
      textCol: String = "text",
      capMetrics: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    // eight 16-bit lanes pack into TWO longs (the hammingNearDup64
    // packing argument ×2): every shuffled row / collected member
    // carries 3 flat longs, and the Hamming check is two bit_counts
    val packed = simhashLanes128(Par.spreadIfBig(docs), idCol, textCol).select(col("doc_id"),
      expr("lanes[0] | shiftleft(lanes[1], 16) | shiftleft(lanes[2], 32)" +
        " | shiftleft(lanes[3], 48)").as("lo"),
      expr("lanes[4] | shiftleft(lanes[5], 16) | shiftleft(lanes[6], 32)" +
        " | shiftleft(lanes[7], 48)").as("hi"))
      // LAZY checkpoint — same double-reference rationale as
      // simhashNearDup's packed frame; three flat longs per row. NOT
      // scale-gated (round-15 probe — see lshCandidatesTracked).
      .localCheckpoint(false)
    hammingNearDup128(spark, packed, maxDist, maxBucket, capMetrics)
  }

  /** Hamming near-dup search over ANY 128-bit signature held as two
    * packed longs `(doc_id, lo, hi)` — [[hammingNearDup64]]'s
    * machinery on four 32-BIT bands (band b = bits [32b, 32b+32) of
    * hi·2⁶⁴+lo). Same semantics, caps and observability; exact
    * verification is `bit_count(lo⊕lo') + bit_count(hi⊕hi') ≤
    * maxDist`; one row per pair.
    *
    * `maxBucket = 0` (the DEFAULT) derives the cap with the same
    * 10×-mean rule (10 × n/2³², floor 10 — the floor governs at any
    * feasible corpus). Unlike the 64-bit path the band census here is
    * O(n) rows (most 32-bit buckets are singletons), so the derivation
    * total comes from a ONE-ROW count aggregate over the signature
    * frame broadcast into the census — never a single-partition window
    * over an n-scale frame. The count prunes to a narrow scan
    * (Catalyst drops the signature projection under count), and the
    * broadcast keeps the whole path lazy — batch only, as with the
    * 64-bit derivation. */
  def hammingNearDup128(spark: SparkSession, packedDf: DataFrame,
      maxDist: Int = 3, maxBucket: Int = 0,
      capMetrics: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    requirePigeonhole(maxDist)
    require(maxBucket >= 0,
      s"maxBucket=$maxBucket must be >= 1, or 0 to derive from the census")
    val packed = packedDf.select(col("doc_id"), col("lo"), col("hi"))
    val buckets = hammingBands128(packed)
    val census = buckets.groupBy(col("band"), col("bval"))
      .agg(count(lit(1)).as("bsize"))
    val sized0 =
      if (maxBucket == 0)
        census.crossJoin(broadcast(packed.groupBy().agg(
          expr("greatest(10L, 10L * ((count(1) + 4294967295) DIV 4294967296))")
            .as("_cap"))))
      else census.withColumn("_cap", lit(maxBucket.toLong))
    val sized = capMetrics.fold(sized0)(o => sized0.observe(o,
      sum(when(col("bsize") > col("_cap"), lit(1L)).otherwise(lit(0L)))
        .as("dropped_buckets"),
      sum(when(col("bsize") > col("_cap"), col("bsize")).otherwise(lit(0L)))
        .as("dropped_doc_slots")))
    val small = sized
      .filter(col("bsize").between(lit(2), col("_cap")))
      .select(col("band"), col("bval"))
    buckets.join(small, Seq("band", "bval")) // mega-buckets die pre-collect
      .groupBy(col("band"), col("bval"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("lo"), col("hi"))))
        .as("ms"))
      .select(explode(expr(
        """flatten(transform(ms, (x, i) ->
          |  transform(slice(ms, i + 2, size(ms)), y ->
          |    struct(x.doc_id AS a_id, y.doc_id AS b_id,
          |           x.lo AS la, y.lo AS lb,
          |           x.hi AS ha, y.hi AS hb))))""".stripMargin)).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"),
        expr("CAST(bit_count(p.la ^ p.lb) + bit_count(p.ha ^ p.hb) AS BIGINT)")
          .as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct() // a pair sharing several bands appears once per band
  }

  /** The 4×32-bit band rows of a two-long 128-bit signature frame —
    * `(doc_id, lo, hi, band, bval)`, [[hammingBands]]' wider cousin
    * behind [[hammingNearDup128]]. The 32-bit extraction masks the
    * arithmetic shift back to an unsigned band value. */
  private[graft] def hammingBands128(packedDf: DataFrame): DataFrame =
    packedDf.select(col("doc_id"), col("lo"), col("hi"),
      posexplode(expr(BandLanes128Sql)).as(Seq("band", "bval")))

  /** The per-row 4×32-bit lane array of a `(lo, hi)` signature — ONE
    * spelling shared by [[hammingBands128]] and the stream probes
    * ([[BandLanesSql]]'s argument at 128 bits). */
  private[graft] val BandLanes128Sql: String =
    """transform(sequence(0, 3), b ->
      |  IF(b < 2, shiftright(lo, b * 32),
      |            shiftright(hi, (b - 2) * 32)) & 4294967295)"""
      .stripMargin

  /** Persist a packed-64 Hamming signature index — the
    * build-once/intake-many layout for CONTENT near-dup at crawl
    * intake (perceptual image hashes via [[graft.multimodal.Multimodal
    * .imageHashes]], SimHash, any 64-bit sketch): `path/sigs`
    * (doc_id, packed) and `path/bsize` (band, bval, n) — the
    * band-bucket census is METADATA-scale (≤ 4·65536 rows regardless
    * of corpus size), so intakes read bucket sizes without ever
    * re-counting the signature table, exactly as [[writeWinnowIndex]]
    * persists fingerprint document frequencies.
    *
    * SCALE BOUNDARY (~O(100M) indexed signatures): the 16-bit band
    * census mean (~n/2¹⁶) makes every arrival's candidate set grow
    * linearly in n/2¹⁶ even though the intake stays increment-bounded
    * — an index that will grow past that belongs on the 128-bit
    * lifecycle ([[writeHammingIndex128]] and family), whose 2³² band
    * space keeps per-arrival candidates duplicate-structure-bounded at
    * any feasible corpus. */
  def writeHammingIndex(spark: SparkSession, packedDf: DataFrame,
      path: String): Unit = {
    // routed write at the CONFIGURED shuffle width: bounded file count
    // at any corpus size (a 100 TB-scan input would otherwise mirror
    // its 10k+ scan splits into 10k+ small files) while keeping the
    // intake's seen-side scan parallel — AQE byte-sizing here would
    // coalesce a mid-size corpus (2M sigs ≈ 32 MB) into ONE file = one
    // scan task, the compactIvfIndex filesPerCell=1 pathology. Big
    // per-file sizes stay scannable: parquet splits by row group.
    packedDf.select(col("doc_id"), col("packed"))
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt,
        col("doc_id"))
      .write.mode("overwrite").parquet(s"$path/sigs")
    rebuildHammingCensus(spark, path)
  }

  /** Recount `path/bsize` from `path/sigs` — the census recovery/
    * repair pass: one scan of the signature table + a metadata-scale
    * aggregate (4·2¹⁶ buckets max). Run it after a failed
    * [[appendHammingIndex]] (sigs appended, census not yet updated)
    * — an UNDERCOUNTED census quietly weakens the mega-bucket guard
    * [[hammingIntake]] relies on, so repair beats limping on. */
  def rebuildHammingCensus(spark: SparkSession, path: String): Unit =
    hammingBands(spark.read.parquet(s"$path/sigs"))
      .groupBy(col("band"), col("bval")).agg(count(lit(1)).as("n"))
      .coalesce(1) // ≤ 4·2¹⁶ rows — every intake reads this whole
      .write.mode("overwrite").parquet(s"$path/bsize")

  /** Append new signatures to a [[writeHammingIndex]] directory: the
    * signature rows append, and the band census updates by METADATA
    * ARITHMETIC — old census + increment counts summed per bucket
    * (both tables ≤ 4·65536 rows) — never a recount of the seen
    * signatures (the [[mergeWinnowIndexes]] df-sum discipline).
    *
    * The increment materializes ONCE (tracked localCheckpoint,
    * released on exit) before either write — evaluating the caller's
    * frame twice would let a non-deterministic input desynchronize
    * sigs and bsize silently. A failure BETWEEN the sigs append and
    * the census overwrite still leaves the two inconsistent: recover
    * with [[rebuildHammingCensus]] before the next intake. */
  def appendHammingIndex(spark: SparkSession, packedDf: DataFrame,
      path: String): Unit = {
    val (inc, blocks) = checkpointTracked(
      packedDf.select(col("doc_id"), col("packed")))
    try {
      // routed append (writeHammingIndex's discipline): the increment
      // re-shuffles on doc_id with AQE-sized output, so a small crawl
      // increment lands as ~ONE file instead of one file per upstream
      // partition — sigs decays by one file per crawl, not
      // tasks-per-crawl, and [[compactHammingIndex]] undoes even that
      inc.repartition(col("doc_id"))
        .write.mode("append").parquet(s"$path/sigs")
      val merged = spark.read.parquet(s"$path/bsize")
        .unionByName(hammingBands(inc)
          .groupBy(col("band"), col("bval")).agg(count(lit(1)).as("n")))
        .groupBy(col("band"), col("bval")).agg(sum(col("n")).as("n"))
        .collect() // metadata-scale: ≤ 4·65536 rows by construction
      import spark.implicits._
      merged.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
        .toDF("band", "bval", "n")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$path/bsize")
    } finally blocks.foreach(_.unpersist(blocking = false))
  }

  /** Compact a [[writeHammingIndex]] directory's signature files:
    * [[appendHammingIndex]] adds ~one file per crawl increment, and
    * after N crawls every intake's seen-side scan pays N file
    * open/footer costs — the flat-table cousin of the IVF index's
    * per-cell decay ([[graft.ext.Similarity.compactIvfIndex]]). When
    * the file LISTING (metadata-scale, no data read) exceeds
    * `maxFiles`, the signature table rewrites once through the same
    * AQE-sized doc_id shuffle the build uses; below the threshold this
    * is a listing and nothing else, so calling it after every append
    * is safe. Rows are bit-preserved and the band census counts only
    * rows, so `bsize` needs no rebuild and intake results are
    * bit-equal before/after (Ext5Spec pins both, and idempotence:
    * a second call compacts nothing). Not safe concurrently with
    * readers (the swap replaces the whole table); run between crawl
    * increments, where appends already serialize. Returns the file
    * count compacted away, 0 if under the threshold.
    *
    * CRASH SAFETY: the rewrite lands in `path/sigs.compact.tmp` while
    * `path/sigs` — the only durable copy — stays untouched, then swaps
    * in by rename (sigs → sigs.compact.old, tmp → sigs, delete old).
    * A crash anywhere before the first rename loses nothing (the
    * orphaned tmp dir is deleted on the next call); a crash BETWEEN
    * the two renames leaves no `sigs` but a complete
    * `sigs.compact.old` — the next call detects exactly that state
    * and renames it back BEFORE doing anything else (self-healing; no
    * manual step). The only non-recoverable window of the previous
    * in-place overwrite (checkpoint blocks as the sole copy of the
    * table) is gone. */
  def compactHammingIndex(spark: SparkSession, path: String,
      maxFiles: Int = 64): Long = {
    require(maxFiles >= 1, s"maxFiles=$maxFiles must be >= 1")
    val sigs = new org.apache.hadoop.fs.Path(s"$path/sigs")
    val fs = sigs.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$path/sigs.compact.tmp")
    val old = new org.apache.hadoop.fs.Path(s"$path/sigs.compact.old")
    // self-heal the between-renames crash window of a PREVIOUS call:
    // no live table + a complete .old means the old table IS the data
    if (!fs.exists(sigs) && fs.exists(old))
      require(fs.rename(old, sigs),
        s"compactHammingIndex: crash recovery rename $old → $sigs failed")
    val nFiles = fs.listStatus(sigs)
      .count(_.getPath.getName.endsWith(".parquet"))
    if (nFiles <= maxFiles) return 0L
    // Rewrite width = the build's configured-width routing, clamped to
    // maxFiles so the rewrite itself can never re-trip the threshold
    // (idempotence — a second call always lists and returns 0). The
    // write streams source → tmp (different paths, so no
    // materialization is needed and the durable table is never the
    // write target).
    val width = math.min(maxFiles,
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    fs.delete(tmp, true); fs.delete(old, true) // orphans of a past crash
    spark.read.parquet(s"$path/sigs").repartition(width, col("doc_id"))
      .write.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(sigs, old), s"compactHammingIndex: rename $sigs → $old failed")
    require(fs.rename(tmp, sigs), s"compactHammingIndex: rename $tmp → $sigs failed")
    fs.delete(old, true)
    nFiles.toLong
  }

  /** Incremental Hamming near-dup intake: pairs each NEW signature
    * with the INDEXED signatures within Hamming ≤ `maxDist`, without
    * ever shuffling or re-counting the seen side — the q103/q160
    * crawl-increment discipline applied to content signatures:
    *
    *  - bucket sizes come from the PERSISTED census (`path/bsize`,
    *    metadata-scale), so the mega-bucket guard costs one broadcast
    *    of a ≤262k-row table: buckets whose INDEXED size exceeds
    *    `maxBucket` contribute no candidates (a solid-color/boilerplate
    *    bucket at crawl scale would otherwise pair every arrival
    *    against millions of members — same deterministic whole-bucket
    *    drop as [[hammingNearDup64]], observable by reading bsize);
    *  - the increment's band rows (4 per arrival, increment-bounded)
    *    BROADCAST into ONE scan of the signature table — the seen side
    *    is scanned, never shuffled;
    *  - verification is the exact packed `bit_count`, and a pair
    *    sharing several bands emits once.
    *
    * Output: (a_id = new, b_id = seen, hamming). Pinned ≡ the
    * brute-force new×seen pair filter on under-cap fixtures
    * (Ext5Spec), and oracle-checked end to end by q169.
    *
    * SIZE `maxBucket` TO THE CORPUS: the 16-bit band space holds 4·2¹⁶
    * buckets, so at n signatures the MEAN bucket carries ~n/2¹⁶
    * members per band — a cap below that drops most LEGITIMATE
    * buckets, not just degenerate ones (band-space saturation;
    * ScaleProbe's `hamming-intake` census measures it at 2M sigs:
    * cap 10 keeps 4% of the true pairs, cap ≈ 10× the mean keeps them
    * all while still dropping the 100k-copy degenerate bucket).
    * `maxBucket = 0` (the DEFAULT) DERIVES the cap from the persisted
    * census ([[deriveHammingCap]]: 10 × the mean bucket size, floor
    * 10 — free, the census is already on disk); read `path/bsize` —
    * it IS the distribution — to pick explicitly. */
  def hammingIntake(spark: SparkSession, newPacked: DataFrame,
      path: String, maxDist: Int = 3, maxBucket: Int = 0): DataFrame = {
    requirePigeonhole(maxDist)
    require(maxBucket >= 0,
      s"maxBucket=$maxBucket must be >= 1, or 0 to derive from the census")
    val cap = if (maxBucket == 0) deriveHammingCap(spark, path) else maxBucket
    val small = spark.read.parquet(s"$path/bsize")
      .filter(col("n") <= cap).select(col("band"), col("bval"))
    val nb = hammingBands(newPacked
        .select(col("doc_id"), col("packed")))
      .select(col("doc_id").as("a_id"), col("packed").as("pa"),
        col("band"), col("bval"))
      .join(broadcast(small), Seq("band", "bval")) // guard pre-scan
    hammingBands(spark.read.parquet(s"$path/sigs"))
      .select(col("doc_id").as("b_id"), col("packed").as("pb"),
        col("band"), col("bval"))
      .join(broadcast(nb), Seq("band", "bval"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), col("pa"), col("pb"))
      .distinct() // several shared bands → one pair
      .select(col("a_id"), col("b_id"),
        expr("CAST(bit_count(pa ^ pb) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** Admission VERDICT of a signature increment against a persisted
    * [[writeHammingIndex]] directory — the media arm of the composed
    * crawl intake ([[graft.ext.Corpus.crawlIntakeMixed]]): the
    * pair-producing [[hammingIntake]] turned into the decision a crawl
    * actually needs, with the text pipeline's stage discipline:
    *
    *  1. EXACT dedup WITHIN the increment — first (smallest) doc_id
    *     per identical signature wins, the media twin of crawlIntake's
    *     content-hash stage (identical bytes hash to the identical
    *     signature; the window routes on the signature, one
    *     increment-bounded exchange);
    *  2. survivors pair against the INDEX ([[hammingIntake]] — seen
    *     side scanned never shuffled, persisted-census bucket cap) and
    *     any arrival within `maxDist` of an indexed signature drops.
    *
    * Output: the admitted `(doc_id, packed)` rows. NULL signatures
    * drop (an undecodable payload upstream has nothing to compare —
    * admit/reject it on its own metadata, not here). Intra-increment
    * NEAR-dups both survive (matching the text intake's contract:
    * arrivals are judged against the SEEN corpus; increment-internal
    * near-dups are the next index append's business). Oracle-checked
    * end to end by q172 on the q166/q169 fixture signatures. */
  def hammingIntakeAdmit(spark: SparkSession, packedDf: DataFrame,
      path: String, maxDist: Int = 3, maxBucket: Int = 0): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("packed"))
    val s1 = packedDf.select(col("doc_id"), col("packed"))
      .filter(col("packed").isNotNull)
      .withColumn("_kmin", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("_kmin"))
      .drop("_kmin")
    val dup = hammingIntake(spark, s1, path, maxDist, maxBucket)
      .select(col("a_id").as("doc_id")).distinct()
    // the dup-id side is increment-bounded (≤ the arrivals) — never
    // let the anti-join sort-merge the increment against it
    s1.join(broadcast(dup), Seq("doc_id"), "left_anti")
  }

  /** The census-derived bucket cap for a [[writeHammingIndex]]
    * directory: 10 × the mean per-band bucket occupancy
    * (nSigs / 2¹⁶), floor 10 — the sizing rule ScaleProbe's
    * `hamming-intake` census measured (mean-relative caps keep the
    * planted pair set while a 100k-copy degenerate bucket stays ~3
    * orders of magnitude above the cap). One aggregate over the
    * metadata-scale census table; opt in with `maxBucket = 0`. */
  def deriveHammingCap(spark: SparkSession, path: String): Int = {
    val row = spark.read.parquet(s"$path/bsize").agg(sum(col("n"))).head()
    val total = (if (row.isNullAt(0)) 0L else row.getLong(0)) / 4
    math.max(10L, 10L * ((total + 65535) / 65536)).toInt
  }

  // ------------------------------------------------------------------
  // 128-bit persisted Hamming index lifecycle — [[writeHammingIndex]]'s
  // build-once/intake-many machinery carried to the (doc_id, lo, hi)
  // two-long signature ([[hammingNearDup128]]'s input), so crawl
  // admission rides the NON-SATURATING 4×32-bit band family past the
  // 64-bit index's ~O(100M)-signature boundary (where the 16-bit band
  // census mean ~n/2¹⁶ makes every arrival's candidate set grow in n).
  //
  // THE CENSUS DESIGN DECISION (explicit, because the 64-bit discipline
  // does not carry): with 2³² buckets per band the census is O(n) ROWS
  // (almost every bucket is a singleton), not the 64-bit index's
  // ≤ 4·2¹⁶-row metadata table, so "collect + overwrite on append" and
  // "read whole at intake" are both wrong at scale. This index persists
  // the census as APPEND-ONLY PARTIAL COUNTS with an aggregate-on-read
  // contract — `path/bsize` rows are (band, bval, n) PARTIALS whose sum
  // per (band, bval) is the true bucket size:
  //  - the BUILD writes the fully-aggregated census (one row/bucket);
  //  - each APPEND appends only the increment's own census
  //    (increment-bounded work — strictly cheaper than the 64-bit
  //    append's collect-merge, which this corpus size could not afford);
  //  - the INTAKE never aggregates the whole census: it semi-joins the
  //    partials against the (broadcast, ≤ 4·|increment|-row) set of
  //    buckets the arrivals actually touch, so the guard's shuffle is
  //    increment-bounded and the census costs one NARROW O(n) scan —
  //    the same asymptotic the intake's signature scan already pays;
  //  - COMPACTION folds partials back to one row per bucket.
  // Under this contract every crash point leaves a VALID index: sigs
  // rows are bit-preserved, census content is representation-
  // independent (partials sum the same before and after folding), and
  // a sigs-append that died before its census-append is repaired by
  // [[rebuildHammingCensus128]] exactly as in the 64-bit lifecycle.
  // ------------------------------------------------------------------

  /** Persist a 128-bit Hamming signature index — `path/sigs`
    * (doc_id, lo, hi) routed at the configured shuffle width (bounded
    * file count at any corpus size, [[writeHammingIndex]]'s argument
    * verbatim) and `path/bsize`, the 4×32-bit band census in the
    * partial-count layout documented above (the build emits it fully
    * aggregated — one row per bucket, O(n) rows by design). */
  def writeHammingIndex128(spark: SparkSession, packedDf: DataFrame,
      path: String): Unit = {
    packedDf.select(col("doc_id"), col("lo"), col("hi"))
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt,
        col("doc_id"))
      .write.mode("overwrite").parquet(s"$path/sigs")
    rebuildHammingCensus128(spark, path)
  }

  /** Recount `path/bsize` from `path/sigs` — the census recovery/
    * repair pass ([[rebuildHammingCensus]]'s 128-bit twin): one scan of
    * the signature table + one groupBy, emitting the fully-aggregated
    * census (which is also how compaction folds partials — fold =
    * rebuild-shaped aggregate over the partials instead of the sigs).
    * Run after a failed [[appendHammingIndex128]] (sigs appended,
    * census increment not yet appended) — an undercounted census
    * quietly weakens the mega-bucket guard. O(n) rows out — written at
    * the aggregate's own shuffle width, never coalesce(1). */
  def rebuildHammingCensus128(spark: SparkSession, path: String): Unit =
    hammingBands128(spark.read.parquet(s"$path/sigs"))
      .groupBy(col("band"), col("bval")).agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$path/bsize")

  /** Append new signatures to a [[writeHammingIndex128]] directory:
    * the signature rows append (AQE-sized — a small crawl increment
    * lands as ~one file), and the census appends the INCREMENT'S OWN
    * band counts as new partial rows — increment-bounded, never a
    * read-modify-write of the O(n) persisted census (the design
    * decision above; the 64-bit append's collect-merge is correct only
    * because ITS census is metadata-scale). The increment materializes
    * once (tracked localCheckpoint, released on exit) so a
    * non-deterministic input cannot desynchronize sigs and bsize. A
    * failure BETWEEN the two appends leaves the census undercounted:
    * recover with [[rebuildHammingCensus128]] before the next intake. */
  def appendHammingIndex128(spark: SparkSession, packedDf: DataFrame,
      path: String): Unit = {
    val (inc, blocks) = checkpointTracked(
      packedDf.select(col("doc_id"), col("lo"), col("hi")))
    try {
      inc.repartition(col("doc_id"))
        .write.mode("append").parquet(s"$path/sigs")
      hammingBands128(inc)
        .groupBy(col("band"), col("bval")).agg(count(lit(1)).as("n"))
        .repartition(col("band"), col("bval")) // AQE-sized: ~one file
        .write.mode("append").parquet(s"$path/bsize")
    } finally blocks.foreach(_.unpersist(blocking = false))
  }

  /** Compact a [[writeHammingIndex128]] directory — BOTH decay axes at
    * once: the signature table's one-file-per-append growth
    * ([[compactHammingIndex]]'s listing-gated rename-swap rewrite,
    * verbatim) and the census's one-PARTIAL-per-append growth (folded
    * by the rebuild-shaped aggregate over the partials — content is
    * identical under the aggregate-on-read contract, so readers before
    * and after see the same bucket sizes; Ext5Spec pins bit-equal
    * intakes). Triggered when either table's file LISTING exceeds
    * `maxFiles`; below the threshold this is two listings and nothing
    * else. Returns the total file count compacted away.
    *
    * CRASH SAFETY: sigs swaps through `sigs.compact.tmp`/`.old` exactly
    * as the 64-bit form, INCLUDING its self-heal — a crash between the
    * two renames of either table leaves no live dir but a complete
    * `.old`, and the next call renames it back before listing (no
    * manual step; until that next call, readers of the missing dir DO
    * fail — run compaction and its recovery from the same maintenance
    * slot). The census fold additionally benefits from representation-
    * independence: partials and folded rows read identically, so every
    * OTHER crash point leaves a census that is not just recoverable
    * but already readable. Not safe concurrently with readers (the
    * swap replaces whole dirs); run between crawl increments, where
    * appends already serialize. */
  def compactHammingIndex128(spark: SparkSession, path: String,
      maxFiles: Int = 64): Long = {
    require(maxFiles >= 1, s"maxFiles=$maxFiles must be >= 1")
    val hconf = spark.sparkContext.hadoopConfiguration
    val width = math.min(maxFiles,
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    def swapRewrite(sub: String, rewrite: DataFrame => DataFrame): Long = {
      val live = new org.apache.hadoop.fs.Path(s"$path/$sub")
      val fs = live.getFileSystem(hconf)
      val tmp = new org.apache.hadoop.fs.Path(s"$path/$sub.compact.tmp")
      val old = new org.apache.hadoop.fs.Path(s"$path/$sub.compact.old")
      // self-heal the between-renames crash window of a PREVIOUS call
      // (compactHammingIndex's rule): no live dir + a complete .old
      // means the old dir IS the table — rename it back first
      if (!fs.exists(live) && fs.exists(old))
        require(fs.rename(old, live),
          s"compactHammingIndex128: crash recovery rename $old → $live failed")
      val nFiles = fs.listStatus(live)
        .count(_.getPath.getName.endsWith(".parquet"))
      if (nFiles <= maxFiles) return 0L
      fs.delete(tmp, true); fs.delete(old, true) // orphans of a past crash
      rewrite(spark.read.parquet(live.toString))
        .write.mode("overwrite").parquet(tmp.toString)
      require(fs.rename(live, old),
        s"compactHammingIndex128: rename $live -> $old failed")
      require(fs.rename(tmp, live),
        s"compactHammingIndex128: rename $tmp -> $live failed")
      fs.delete(old, true)
      nFiles.toLong
    }
    swapRewrite("sigs", _.repartition(width, col("doc_id"))) +
      swapRewrite("bsize", _.groupBy(col("band"), col("bval"))
        .agg(sum(col("n")).as("n"))
        // the fold must land UNDER the threshold or the next call
        // re-rewrites the whole O(n) census forever (the sigs arm's
        // idempotence argument); coalesce merges the aggregate's
        // output partitions without another shuffle
        .coalesce(width))
  }

  /** The census-derived bucket cap for a [[writeHammingIndex128]]
    * directory: 10 × the mean per-band bucket occupancy (nSigs / 2³²),
    * floor 10 — [[deriveHammingCap]]'s rule at the 32-bit band space,
    * where the FLOOR governs at any feasible corpus (the mean bucket
    * stays below one until ~4B signatures). Total signatures =
    * Σ partial counts / 4: one narrow map-side-combined scan of the
    * census — O(n) rows by design (see the lifecycle note), the same
    * asymptotic as the intake's own signature scan. */
  def deriveHammingCap128(spark: SparkSession, path: String): Int = {
    val row = spark.read.parquet(s"$path/bsize").agg(sum(col("n"))).head()
    val total = (if (row.isNullAt(0)) 0L else row.getLong(0)) / 4
    math.max(10L, 10L * ((total + 4294967295L) / 4294967296L)).toInt
  }

  /** Incremental 128-bit Hamming near-dup intake — [[hammingIntake]]'s
    * crawl-increment discipline on the non-saturating signature: pairs
    * each NEW (doc_id, lo, hi) with the INDEXED signatures within
    * Hamming ≤ `maxDist` (summed over both longs), seen side scanned
    * never shuffled. The guard differs from the 64-bit form EXACTLY
    * where the census design does: instead of broadcasting the whole
    * (there metadata-scale) census, the arrivals' ≤ 4·|increment|
    * distinct touched buckets broadcast INTO the census partials, and
    * only those buckets aggregate — so the guard's shuffle is
    * increment-bounded and the census costs one narrow scan. Buckets
    * whose indexed size exceeds the cap contribute no candidates (the
    * deterministic whole-bucket drop); buckets with NO indexed member
    * drop at the same join (no partner to pair with).
    *
    * Output: (a_id = new, b_id = seen, hamming). `maxBucket = 0` (the
    * DEFAULT) derives the cap via [[deriveHammingCap128]]. Pinned ≡
    * the brute-force new×seen pair filter on under-cap fixtures
    * (Ext5Spec) and oracle-checked end to end by q173. */
  def hammingIntake128(spark: SparkSession, newPacked: DataFrame,
      path: String, maxDist: Int = 3, maxBucket: Int = 0): DataFrame = {
    requirePigeonhole(maxDist)
    require(maxBucket >= 0,
      s"maxBucket=$maxBucket must be >= 1, or 0 to derive from the census")
    val cap = if (maxBucket == 0) deriveHammingCap128(spark, path) else maxBucket
    val nb0 = hammingBands128(newPacked
        .select(col("doc_id"), col("lo"), col("hi")))
      .select(col("doc_id").as("a_id"), col("lo").as("la"),
        col("hi").as("ha"), col("band"), col("bval"))
    // exact sizes for TOUCHED buckets only: partials ⋉ broadcast(touched)
    // → aggregate — increment-bounded shuffle over an O(n) narrow scan
    val touched = nb0.select(col("band"), col("bval")).distinct()
    val okBuckets = spark.read.parquet(s"$path/bsize")
      .join(broadcast(touched), Seq("band", "bval"))
      .groupBy(col("band"), col("bval")).agg(sum(col("n")).as("n"))
      .filter(col("n") <= cap) // n >= 1 by construction: indexed + under cap
      .select(col("band"), col("bval"))
    val nb = nb0.join(broadcast(okBuckets), Seq("band", "bval"))
    hammingBands128(spark.read.parquet(s"$path/sigs"))
      .select(col("doc_id").as("b_id"), col("lo").as("lb"),
        col("hi").as("hb"), col("band"), col("bval"))
      .join(broadcast(nb), Seq("band", "bval"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), col("la"), col("lb"),
        col("ha"), col("hb"))
      .distinct() // several shared bands → one pair
      .select(col("a_id"), col("b_id"),
        expr("CAST(bit_count(la ^ lb) + bit_count(ha ^ hb) AS BIGINT)")
          .as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** Admission VERDICT of a 128-bit signature increment against a
    * persisted [[writeHammingIndex128]] directory —
    * [[hammingIntakeAdmit]]'s two stages on the non-saturating
    * signature: exact dedup WITHIN the increment (first doc_id per
    * identical (lo, hi) wins — one increment-bounded exchange), then
    * survivors with no indexed signature within `maxDist` admit
    * ([[hammingIntake128]]; the dup side is increment-bounded and
    * broadcast into the anti-join). Rows where either long is NULL
    * drop (nothing to compare). Output: the admitted (doc_id, lo, hi)
    * rows, ready for [[appendHammingIndex128]] so the next increment
    * sees this one. Oracle-checked end to end by q174. */
  def hammingIntakeAdmit128(spark: SparkSession, packedDf: DataFrame,
      path: String, maxDist: Int = 3, maxBucket: Int = 0): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lo"), col("hi"))
    val s1 = packedDf.select(col("doc_id"), col("lo"), col("hi"))
      .filter(col("lo").isNotNull && col("hi").isNotNull)
      .withColumn("_kmin", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("_kmin"))
      .drop("_kmin")
    val dup = hammingIntake128(spark, s1, path, maxDist, maxBucket)
      .select(col("a_id").as("doc_id")).distinct()
    s1.join(broadcast(dup), Seq("doc_id"), "left_anti")
  }

  /** Exact cap diagnostics for [[simhashNearDup]] as a standalone
    * one-row aggregate — the always-correct companion to its zero-cost
    * `capMetrics` observation, exactly as [[lshCapStats]] is to
    * [[lshCandidates]]. Reports what the `maxBucket` cap dropped
    * (lane-buckets and the doc×lane memberships they held), what
    * survived, and the hottest bucket. Narrow lane computation + two
    * partial-aggregable shuffles, no join. */
  def simhashCapStats(spark: SparkSession, docs: DataFrame,
      maxBucket: Int = 0, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(maxBucket >= 0,
      s"maxBucket=$maxBucket must be >= 1, or 0 to derive from the census")
    // maxBucket = 0 → the same in-plan census-derived cap the default
    // [[simhashNearDup]] applies, so the diagnostics report against
    // the cap the dedup actually uses
    withHammingCap(
      simhashLanes(docs, idCol, textCol)
        .select(posexplode(col("lanes")).as(Seq("band", "bval")))
        .groupBy(col("band"), col("bval"))
        .agg(count(lit(1)).as("bsize")), maxBucket)
      .agg(
        sum(when(col("bsize") > col("_cap"), lit(1L)).otherwise(lit(0L)))
          .as("dropped_buckets"),
        sum(when(col("bsize") > col("_cap"), col("bsize")).otherwise(lit(0L)))
          .as("dropped_doc_slots"),
        sum(when(col("bsize").between(lit(2), col("_cap")), lit(1L))
          .otherwise(lit(0L))).as("kept_buckets"),
        max(col("bsize")).as("max_bucket_size"))
  }

  /** Bag-of-words fingerprint: md5 of the sorted distinct word set — a
    * reorder/repetition-invariant content hash (catches shuffled or
    * re-repeated copies that byte-exact dedup misses, without the
    * probabilistic machinery of MinHash). Pure narrow per-row select. */
  def bowFingerprint(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      md5(array_join(array_sort(array_distinct(split(col(textCol), " "))), " "))
        .as("bow_hash"))

  /** Reorder-invariant exact dedup over the bag-of-words fingerprint:
    * one partial-aggregable groupBy keeping the smallest doc_id per
    * word-set class ([[exact]] generalized to order-insensitive
    * content). */
  def bowDedup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    bowFingerprint(docs, idCol, textCol)
      .groupBy(col("bow_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))

  /** Cross-document repeated span detection — the discovery half of
    * exact-substring dedup (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better", ACL'22): word `spanWords`-grams at
    * the first MaxShinglePos positions (the engine-wide positional-cap
    * contract), grouped corpus-wide, keeping spans seen in ≥ `minDocs`
    * distinct documents; top-`k` by (doc count, occurrences, span).
    *
    * Scale shape (the q125 GramKeys discipline, applied round 11): the
    * counting aggregate never sees a span STRING — spans shuffle as
    * compiled 64-bit sequence hashes ([[spanKeyRows]]; 8 bytes/row
    * where the string form shuffled ~60), and strings materialize ONLY
    * for the ≤ k winning hashes plus their (n_docs, n_occ) boundary
    * ties: the k-th boundary comes off a TakeOrdered (k driver rows),
    * winners broadcast back into one narrow re-enumeration pass, and
    * the final (doc count, occurrences, SPAN) ordering resolves on the
    * recovered strings. Hash↔span is a bijection modulo 64-bit
    * collisions (GramKeys' documented contract, ~1e-7 at 10⁶ distinct
    * grams): the DuckDB oracle replays the string form verbatim. */
  def repeatedSpans(docs: DataFrame, spanWords: Int = 8, minDocs: Int = 2,
      k: Int = 20, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the duplicated-span count table feeds BOTH the boundary pick and
    // the winner filter — checkpointed so the corpus-wide counting
    // aggregate runs ONCE. Each hash also carries its lexicographically
    // smallest (doc_id, position) occurrence as a REPRESENTATIVE: the
    // hash↔span bijection means any occurrence recovers the same
    // string, so the recovery pass never re-enumerates grams — it
    // slices exactly the ≤ k+ties representative docs (the first-cut
    // rewrite re-ran gram_keys over the whole corpus to find winner
    // strings: 4.9s → 4.2s → this shape).
    val (cnts, cntBlocks) = checkpointTracked {
      graft.functions.GramKeys.register(spark, Seq(spanWords),
        graft.functions.MinHash48.MaxShinglePos - 1)
      // scale-gated spread before the gram explode: the corpus-wide
      // counting pass partial-aggregates ON the scan's splits, so a
      // one-row-group arrival serialized it (2.6 s two-task job = half
      // of q87's wall at the 50k decade); no-op at sf0.1 (under the
      // gate) and at production split counts
      Par.spreadIfBig(docs
          .filter(size(split(col(textCol), " ")) >= spanWords))
        .select(col(idCol).as("doc_id"),
          posexplode(expr(s"gram_keys($textCol)")).as(Seq("i", "t")))
        .select(col("doc_id"), col("i"), col("t.h").as("spanh"))
        // explicit two-stage regroup instead of
        // countDistinct + count + min(struct) in one aggregate: the
        // mixed distinct/non-distinct rewrite plans through an Expand
        // that DOUBLES the 10⁷-row span stream with the struct aboard
        // (measured +0.4s at sf1); per-(spanh, doc) partials then a
        // spanh roll-up carry the same information through one
        // ordinary exchange
        .groupBy(col("spanh"), col("doc_id"))
        .agg(count(lit(1)).as("_c"), min(col("i")).as("_mi"))
        .groupBy(col("spanh"))
        .agg(count(lit(1)).as("n_docs"), sum(col("_c")).as("n_occ"),
          min(struct(col("doc_id"), col("_mi").as("i"))).as("rep"))
        .filter(col("n_docs") >= minDocs)
    }
    try {
      val top = cnts
        .orderBy(col("n_docs").desc, col("n_occ").desc).limit(k).collect()
      if (top.isEmpty)
        return Seq.empty[(String, Long, Long)].toDF("span", "n_docs", "n_occ")
      val (bd, bo) = (top.last.getLong(1), top.last.getLong(2))
      // every hash at-or-above the k-th (n_docs, n_occ) — the
      // span-string tiebreak can only resolve after recovery, so
      // boundary ties all come back (bounded by the tie population,
      // the same set a string-keyed TakeOrdered would compare)
      val winners = cnts.filter(col("n_docs") > bd ||
          (col("n_docs") === bd && col("n_occ") >= bo))
        .select(col("n_docs"), col("n_occ"),
          col("rep.doc_id").as("_rep_doc"), col("rep.i").as("_rep_i"))
      // the result is ≤ k rows BY CONTRACT: collect it and return a
      // local frame, so the checkpoint blocks release before returning
      // instead of being pinned by a lazy consumer
      val rows = docs
        .select(col(idCol).as("_rep_doc"), split(col(textCol), " ").as("w"))
        .join(broadcast(winners), Seq("_rep_doc"))
        .select(
          array_join(slice(col("w"), col("_rep_i") + 1, lit(spanWords)), " ").as("span"),
          col("n_docs"), col("n_occ"))
        .orderBy(col("n_docs").desc, col("n_occ").desc, col("span"))
        .limit(k)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      rows.toSeq.toDF("span", "n_docs", "n_occ")
    } finally cntBlocks.foreach(_.unpersist(blocking = false))
  }

  /** (doc_id, spanh) rows: the 64-bit sequence hash of each word
    * `spanWords`-gram at the first MaxShinglePos positions — the
    * shared generator behind [[repeatedSpans]] and [[dupSpanStats]],
    * compiled ([[graft.functions.GramKeys]]: per-word FNV-1a +
    * polynomial prefix, O(1) per gram, no string ever materializes).
    * Enumeration matches the string generator it replaced exactly:
    * gram_keys at cap MaxShinglePos−1 emits starts 0..min(L−n,
    * cap) inclusive = min(L−n+1, MaxShinglePos) full windows, and the
    * pre-filter drops docs shorter than the window (whose single
    * CLIPPED gram the string form never produced). */
  private def spanKeyRows(docs: DataFrame, spanWords: Int, idCol: String,
      textCol: String): DataFrame = {
    graft.functions.GramKeys.register(docs.sparkSession, Seq(spanWords),
      graft.functions.MinHash48.MaxShinglePos - 1)
    // scale-gated spread before the explode (see repeatedSpans — same
    // one-split serialization hazard on the corpus-wide gram pass)
    Par.spreadIfBig(docs
        .filter(size(split(col(textCol), " ")) >= spanWords))
      .select(col(idCol).as("doc_id"),
        explode(expr(s"gram_keys($textCol)")).as("t"))
      .select(col("doc_id"), col("t.h").as("spanh"))
  }

  /** Per-document duplicated-span fraction: what share of a document's
    * word `spanWords`-grams also appear in ≥ `minDocs` distinct
    * documents — the per-doc filter signal behind exact-substring dedup
    * (flag or drop documents that are mostly corpus-duplicated text, the
    * RefinedWeb/Gopher discipline). Companion to [[repeatedSpans]],
    * which reports the spans themselves.
    *
    * Scale shape: the denominator (span count per doc) is computed
    * NARROWLY from the word count — no explode needed; only the
    * numerator touches the exploded span rows: one partial-aggregable
    * distinct-doc count, a filter down to the (much smaller)
    * duplicated-span set, a semi-join back, and a doc-keyed partial
    * count. All keys are uniformly-distributed text/ids — skew-free,
    * and since round 11 they are compiled 64-bit hashes
    * ([[spanKeyRows]]) rather than gram strings: the output carries
    * counts only, so no string ever needs recovering, and both
    * exchanges shrink ~8× (the q88 sf1 watch item). The DuckDB oracle
    * replays the string form — equality modulo GramKeys' documented
    * 64-bit collision odds. */
  def dupSpanStats(docs: DataFrame, spanWords: Int = 8, minDocs: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val maxPos = graft.functions.MinHash48.MaxShinglePos
    // the span stream feeds BOTH the dup-span census and the per-doc
    // count, under different aggregations — unmaterialized, each
    // reference re-ran the corpus gram explode (two 1.1–2.7 s
    // under-split jobs = 60% of q88's wall at the 50k decade). One
    // per-(spanh, doc) partial aggregate is computed ONCE behind a lazy
    // checkpoint (materializes on the first action; ContextCleaner
    // frees the blocks when the caller drops the frame — the
    // containment pattern); both consumers derive from it exactly:
    // span_docs = row count per spanh (the pairs are distinct by
    // construction), per-doc dup count = Σ occurrences over dup spans.
    val pairs = spanKeyRows(docs, spanWords, idCol, textCol)
      .groupBy(col("spanh"), col("doc_id"))
      .agg(count(lit(1)).as("_c"))
      .localCheckpoint(false)
    val dupSpans = pairs.groupBy(col("spanh"))
      .agg(count(lit(1)).as("span_docs"))
      .filter(col("span_docs") >= minDocs)
      .select(col("spanh"))
    val dupPerDoc = pairs.join(dupSpans, Seq("spanh"), "left_semi")
      .groupBy(col("doc_id")).agg(sum(col("_c")).as("n_dup_spans"))
    docs
      .select(col(idCol).as("doc_id"),
        least(greatest(size(split(col(textCol), " ")) - (spanWords - 1), lit(0)),
          lit(maxPos)).cast("long").as("n_spans"))
      .join(dupPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        when(col("n_spans") > 0,
          round(coalesce(col("n_dup_spans"), lit(0L)).cast("double") /
            col("n_spans"), 6)).otherwise(lit(0.0)).as("dup_frac"))
  }

  /** Keep-BEST-per-cluster dedup: the near-dup clustering ([[clusters]]
    * over [[lshCandidates]] — q65's exact components) with the survivor
    * chosen by QUALITY instead of smallest id — production pipelines
    * keep the longest/cleanest copy of a duplicate group, not an
    * arbitrary one. Survivor = max `qualityCol` (doc_id-ascending
    * tie-break); singletons keep themselves. Scale shape: the cluster
    * table is candidate-bounded (never corpus-sized), the left join
    * adds labels without shuffling unclustered docs' text, and the
    * survivor window partitions by cluster_id — near-dup groups are
    * small by construction (the LSH cap bounds bucket fan-out), so no
    * skewed window partitions. */
  def keepBestPerCluster(spark: SparkSession, docs: DataFrame,
      qualityCol: String = "n_chars",
      idCol: String = "doc_id"): DataFrame = {
    val cl = clusters(spark, lshCandidates(spark, docs))
      .select(col("node").as(idCol), col("cluster_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col(qualityCol).desc, col(idCol))
    docs.select(col(idCol), col(qualityCol))
      .join(cl, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
      .withColumn("keep", row_number().over(w) === 1)
  }
}
