package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline drive over the testdata corpus:
  * scrub → exact + near-dup dedup (minhash-LSH → clusters) → quality +
  * language scoring → deterministic split → context-window packing →
  * TF-IDF vocabulary — the document half; embeddings go through IVF
  * assignment + full probe/rerank search. One narrow pass per stage,
  * survivors carried by id (broadcast semi-joins), no driver loops.
  *
  * Run: sbt "runMain graft.ext.ExtDemo [sfDir]"
  */
object ExtDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events ts
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n0 = docs.count()

    // 1+2. scrub boilerplate, then one-call dedup on the CLEANED text
    // (exact via content-hash window + near-dup via LSH → components,
    // cluster-min survivors — Dedup.dedupCorpus)
    val cleaned = TextStats.scrub(docs, Seq("the", "a"))
      .select(col("doc_id"), col("source"), col("cleaned").as("text"))
    val n1 = cleaned.count()
    // observe what the LSH mega-bucket cap cost (OP-A5 discipline): a
    // production run must see how many buckets/doc-slots lost candidates
    val lshCaps = org.apache.spark.sql.Observation("lsh_caps")
    val deduped = Dedup.dedupCorpus(spark, cleaned, capMetrics = Some(lshCaps))
    val n2 = deduped.count()
    val caps = lshCaps.get // empty only if AQE erased an all-capped plan
    println(s"[ext-demo] lsh cap: ${caps.getOrElse("dropped_buckets", "n/a")} buckets / " +
      s"${caps.getOrElse("dropped_doc_slots", "n/a")} doc-slots dropped by maxBucket")

    // 2b. privacy + boilerplate + benchmark hygiene on the survivors
    val pii = TextStats.scrubPii(cleaned)
      .agg(sum(col("n_emails")), sum(col("n_phones"))).head()
    val chunksDropped = Dedup.dedupChunks(cleaned)
      .agg(sum(col("n_dropped_chunks"))).head().getLong(0)
    val contaminated = TextStats.decontaminate(deduped, col("doc_id") % 50 === 0)
      .filter(col("contaminated")).count()
    println(s"[ext-demo] hygiene: ${pii.getLong(0)} emails / ${pii.getLong(1)} phones " +
      s"redacted; $chunksDropped boilerplate chunks dropped; " +
      s"$contaminated train docs share 3-grams with the eval slice")
    val withinDropped = TextStats.dedupWithinDoc(cleaned)
      .agg(sum(col("n_dropped_chunks"))).head().getLong(0)
    val ov = Dedup.corpusOverlap(spark, cleaned, col("doc_id") % 2 === 0).head()
    println(s"[ext-demo] within-doc repeats dropped: $withinDropped; " +
      s"half-vs-half corpus overlap estimate: ${ov.getAs[Double]("j_estimate")}")

    // 2c. corpus health screens: per-source length anomalies, tokenizer
    // coverage (OOV vs the corpus's own top-16 vocab), next BPE merge
    val outliers = TextStats.lengthZscore(docs).filter(col("is_outlier")).count()
    val oov = TextStats.oovRate(cleaned).agg(
      round(avg(col("oov_rate")), 4)).head().getDouble(0)
    val topPair = TextStats.bpePairStats(cleaned, k = 1).head()
    println(s"[ext-demo] health: $outliers length outliers; mean OOV rate $oov; " +
      s"next BPE merge '${topPair.getString(0)}' (${topPair.getLong(1)} occurrences)")
    val bpe = TextStats.bpeTrain(cleaned, nMerges = 5)
    println(s"[ext-demo] bpe vocab: " +
      bpe.map(m => s"${m._4}(${m._5})").mkString(" "))

    // 2d. sketch calibration: how far the minhash estimate sits from
    // true Jaccard on this corpus's candidate pairs — the number that
    // justifies (or indicts) a chosen verify threshold
    val calib = Dedup.minhashCalibration(spark, cleaned)
      .agg(count(lit(1)).as("n"), round(avg(col("abs_err")), 4).as("mae"),
        round(max(col("abs_err")), 4).as("worst")).head()
    println(s"[ext-demo] sketch calibration: ${calib.getLong(0)} pairs, " +
      s"mean |est-true| ${calib.getDouble(1)}, worst ${calib.getDouble(2)}")

    // 3. quality gate + split + packing — the composite Gopher gate
    // (narrow form: the same operator streams in Streams.qualityGate)
    val verdicts = TextStats.gopherFilterNarrow(deduped)
    val gateKept = verdicts.filter(col("keep")).count()
    val topReason = verdicts.filter(!col("keep"))
      .groupBy(col("reason_mask")).count()
      .orderBy(col("count").desc).limit(1).collect().headOption
      .map(r => s"mask=${r.getLong(0)} (${r.getLong(1)} docs)").getOrElse("none")
    println(s"[ext-demo] gopher gate: $gateKept/${n2} kept; top drop reason: $topReason")

    val gated = TextStats.quality(deduped, Seq("and", "of", "to"))
      .filter(col("n_words") >= 10)
    val split = Sampling.hashSplit(gated)
    val packed = Sampling.packSequences(
      split.filter(col("split") === "train"), budget = 512)
    val splitCounts = split.groupBy("split").count().orderBy("split").collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" ")
    val nBins = packed.agg(countDistinct(col("source"), col("bin"))).head().getLong(0)

    // 3b. source tempering + LM quality scoring on the gated survivors
    val mixed = Sampling.mixResample(gated, alpha = 0.5)
    val wRange = mixed.agg(min("mix_weight"), max("mix_weight"),
      sum(when(col("keep"), 1L).otherwise(0L))).head()
    val lm = TextStats.lmScore(gated)
    val lmStats = lm.agg(min("avg_nll"), max("avg_nll")).head()
    println(f"[ext-demo] mix: weights ${wRange.getDouble(0)}%.3f..${wRange.getDouble(1)}%.3f " +
      s"keep ${wRange.getLong(2)}; lm nll ${lmStats.getDouble(0)}..${lmStats.getDouble(1)}")

    // 4. corpus vocabulary: TF-IDF top terms over the surviving train set
    val vocab = TextStats.tfidfTopK(
        split.filter(col("split") === "train"), k = 1)
      .groupBy(col("term")).agg(count(lit(1)).as("n_docs_top"))
      .orderBy(col("n_docs_top").desc, col("term")).limit(5)
      .collect().map(r => s"${r.getString(0)}(${r.getLong(1)})").mkString(" ")

    println(s"[ext-demo] docs: $n0 (scrubbed $n1) → deduped $n2; " +
      s"splits: $splitCounts; train bins(512 tok): $nBins")
    println(s"[ext-demo] top tf-idf head terms: $vocab")

    // 5. embeddings: vector QA, then IVF assign + full search
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nprof = Similarity.normProfile(spark, emb)
      .agg(min("min_norm"), max("max_norm"), sum("n_zero")).head()
    println(s"[ext-demo] vector QA: norms ${nprof.getDouble(0)}..${nprof.getDouble(1)}, " +
      s"${nprof.getLong(2)} zero vectors")
    val cells = Similarity.ivfAssign(spark, emb, col("vec_id") % 50 === 0)
      .groupBy(col("centroid_id")).count()
    val stats = cells.agg(min("count"), max("count"), count(lit(1))).head()
    val hits = Similarity.ivfTopK(spark, emb,
      centroidPred = col("vec_id") % 50 === 0,
      queryPred = col("vec_id") % 97 === 0, nProbe = 2, k = 5)
    println(s"[ext-demo] ivf: ${stats.getLong(2)} cells " +
      s"(size ${stats.getLong(0)}..${stats.getLong(1)}); " +
      s"search hits: ${hits.count()} for ${hits.select("q_id").distinct().count()} queries")
    // 6. events: point-in-time enrichment (clicks ← latest prior purchase)
    val ev = graft.core.Tables.events(spark, sfDir)
      .withColumn("ts_us", expr("ts DIV 1000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value").as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
    val enriched = AsOf.joinAsOf(clicks, purchases, Seq("user_id"),
      "ts_us", "event_id", "value", "last_purchase_value")
    val withPrior = enriched.filter(col("last_purchase_value").isNotNull).count()
    println(s"[ext-demo] as-of: ${enriched.count()} clicks, $withPrior with a prior purchase")
    println("[ext-demo] OK")
    spark.stop()
  }
}
