package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Third embeddings decade (2,000,000 × 64, Spark-only): pins that the
  * round-9 IVF mechanisms — `centroid_topk` compiled assignment,
  * one-file-per-cell routed writes, bounded compaction — and the
  * round-10 fused ADC aggregate hold at another ×10, where the
  * QUANTIZER IS HELD FIXED (2,000 centroids drawn from the first 200k
  * ids, present at both scales) so cells get 10× denser: the axis
  * that stresses per-cell file routing, probe-time rerank volume and
  * compaction, independent of query-batch size (the 201-query batch
  * is also fixed across scales).
  *
  * Expected shapes (a row "holds" when its scale-up tracks its work):
  *  - index/PQ builds: ×10 rows through a narrow assignment + one
  *    routed shuffle → ~×10;
  *  - search-only: fixed |q|·nProbe probed cells, each 10× denser →
  *    ~×10 rerank pairs;
  *  - fused exhaustive ADC: fixed |q| × 10× corpus → ~×10 pairs
  *    (the 200k decade's ×100 bar came from |q| growing with n);
  *  - capped nearDupPairsAnn: cap bounds cell contributions, so the
  *    pair work is cap-bounded, not density-bounded.
  * Run on a quiet machine: `SPARK_GRAFT_CPUS=32 sbt "runMain
  * graft.tools.Decade3Probe"` (add a smaller first arg to downscale,
  * e.g. 200000 for a dry run). */
object Decade3Probe {
  def main(args: Array[String]): Unit = {
    val big = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 131072)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "24g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def rmTemp(path: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      ()
    }
    // ScaleProbe's clustered generator: spikes along 64 axes + a
    // pseudo-random fill — dense-ish natural clusters, near-dup-like
    def clustered(lo: Long, hi: Long) = spark.range(lo, hi, 1, 64).select(
      col("id").as("vec_id"),
      expr("""transform(sequence(0, 63), d ->
              | CAST(CASE WHEN d = pmod(id, 64) THEN 1.0
              |       ELSE CAST(pmod(id * (d + 17), 97) AS DOUBLE) / 1940.0
              |  END AS FLOAT))""".stripMargin).as("embedding"))
    // fixed across scales: 2,000 centroids and 201 queries, all drawn
    // from ids < 200k (present at both scales)
    val centPred = col("vec_id") < 200000L && col("vec_id") % 100 === 0
    def queries(n: Long) = clustered(0, n)
      .filter(col("vec_id") < 200000L && col("vec_id") % 997 === 0)

    def time(f: => Unit): Double = {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
    }
    def cellFiles(dir: String, sub: String): Seq[Int] =
      new java.io.File(s"$dir/$sub").listFiles()
        .filter(_.getName.startsWith("centroid_id="))
        .map(_.listFiles().count(_.getName.endsWith(".parquet"))).toSeq

    val results = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.LinkedHashMap[Long, Double]]()
    def rec(row: String, n: Long, secs: Double, extra: String = ""): Unit = {
      results.getOrElseUpdate(row,
        scala.collection.mutable.LinkedHashMap[Long, Double]())(n) = secs
      println(f"[decade3] $row%-26s n=$n%8d  $secs%8.2fs  $extra")
    }

    for (n <- Seq(big / 10, big)) {
      val emb = clustered(0, n)
      val dir = java.nio.file.Files.createTempDirectory(s"d3_$n").toString

      // IVF index build (centroid_topk narrow assign + routed write)
      rec("ivf_build", n, time {
        graft.ext.Similarity.writeIvfIndex(spark, emb, centPred, s"$dir/ivf",
          trainIters = 0) // seed build: the decade series baseline
      }, { val f = cellFiles(s"$dir/ivf", "assigned")
           s"cells=${f.length} files/cell max=${f.max}" })

      // search-only against the persisted index (fixed 201 queries,
      // cells 10x denser at the big scale)
      val q = queries(n).localCheckpoint(true)
      rec("ivf_search_only", n, time {
        graft.ext.Similarity.ivfTopKIndexed(spark, s"$dir/ivf", q,
          nProbe = 4, k = 10).write.format("noop").mode("overwrite").save()
      })

      // 10 crawl appends (n/20 each) -> census -> compaction -> probe
      for (a <- 0 until 10) {
        graft.ext.Similarity.appendIvfIndex(spark,
          clustered(n + a * (n / 20), n + (a + 1) * (n / 20)), s"$dir/ivf")
      }
      val frag = cellFiles(s"$dir/ivf", "assigned")
      val probeFrag = time {
        graft.ext.Similarity.ivfTopKIndexed(spark, s"$dir/ivf", q,
          nProbe = 4, k = 10).write.format("noop").mode("overwrite").save()
      }
      var nComp = 0L
      val tComp = time { nComp =
        graft.ext.Similarity.compactIvfIndex(spark, s"$dir/ivf") }
      val comp = cellFiles(s"$dir/ivf", "assigned")
      val probeComp = time {
        graft.ext.Similarity.ivfTopKIndexed(spark, s"$dir/ivf", q,
          nProbe = 4, k = 10).write.format("noop").mode("overwrite").save()
      }
      rec("ivf_compact", n, tComp,
        f"10 appends: files/cell max ${frag.max} -> ${comp.max} " +
        f"($nComp cells), probe $probeFrag%.2fs -> $probeComp%.2fs")

      // IVF+PQ build + indexed search (the production layout, q164)
      rec("ivfpq_build", n, time {
        graft.ext.Similarity.writeIvfPqIndexWith(spark, emb, centPred,
          graft.ext.Similarity.fixedCodebooks(), s"$dir/pq")
      }, { val f = cellFiles(s"$dir/pq", "codes")
           s"cells=${f.length} files/cell max=${f.max}" })
      rec("ivfpq_search", n, time {
        graft.ext.Similarity.ivfPqSearch(spark, s"$dir/pq", q,
          nProbe = 4, topK = 10).write.format("noop").mode("overwrite").save()
      })

      // fused exhaustive ADC baselines (round-10 adc_topk_multi):
      // fixed |q| x 10x corpus -> ~x10 pairs per decade
      rec("sq_search_fused", n, time {
        graft.ext.Similarity.sqSearch(spark,
          emb.unionByName(q.withColumn("vec_id", col("vec_id") + 100000000L)
            .select(col("vec_id"), col("embedding"))),
          col("vec_id") >= 100000000L, topK = 10)
          .write.format("noop").mode("overwrite").save()
      })
      rec("pq_adc_fused", n, time {
        val cbs = graft.ext.Similarity.fixedCodebooks()
        graft.ext.Similarity.pqSearchADC(spark, emb,
          graft.ext.Similarity.pqEncode(spark, emb, cbs), cbs,
          col("vec_id") < 200000L && col("vec_id") % 997 === 0, topK = 10)
          .write.format("noop").mode("overwrite").save()
      })

      // capped ANN-blocked near-dup pairs (q165's scale path): the cap
      // bounds in-cell pair work as cells densify
      rec("near_dup_ann_capped", n, time {
        graft.ext.Similarity.nearDupPairsAnn(spark, emb,
          samplePred = col("vec_id") % 997 === 0, threshold = 0.9,
          maxCluster = 20000, pairSalts = 16)
          .write.format("noop").mode("overwrite").save()
      })

      // quantizer audit (round 11, extended round 12): TRAINED
      // (trainIvfCentroids, 2 spherical-Lloyd iterations under the
      // engine's own cosine assignment) vs FIXED (seed rows) centroids
      // — recall@10 vs the exact brute force and the cell-size census,
      // both scales. The exact baseline is computed once per scale.
      //
      // TWO query populations. In-corpus queries (the r11 audit)
      // SATURATE: every query IS a corpus member, so its own cell
      // always holds it and recall reads 1.000 for any quantizer at
      // any nProbe — useless for ranking quantizers. The round-12
      // columns use OFF-CORPUS perturbed queries: a corpus vector +
      // ε · deterministic per-dim pseudo-noise (no RNG — replayable),
      // off the corpus but anchored to it, so ground truth still
      // exists (cosineTopKAgainst) and recall spreads below 1.0 where
      // the cell structure actually loses neighbors.
      val exact = graft.ext.Similarity.cosineTopK(spark, emb,
          col("vec_id") < 200000L && col("vec_id") % 997 === 0, 10)
        .select(col("q_id"), col("n_id")).localCheckpoint(true)
      val nQ = exact.select(col("q_id")).distinct().count()
      // fresh ids (anchor + 10⁹): a perturbed query must NOT reuse its
      // anchor's corpus id — ivfTopKIndexed's q_id ≠ n_id self-filter
      // would silently drop the anchor from the approx side while the
      // ground truth ranks it, deflating every recall number
      def perturbed(eps: Double) = queries(n).select(
        (col("vec_id") + 1000000000L).as("vec_id"),
        expr(s"""transform(sequence(0, 63), d -> CAST(
                |  CAST(embedding[d] AS DOUBLE) + $eps *
                |  (CAST(pmod(vec_id * (d + 29) + 7, 101) AS DOUBLE) / 50.0
                |    - 1.0) AS FLOAT))""".stripMargin).as("embedding"))
      val epss = Seq(0.02, 0.05)
      val pq = epss.map(e => e -> perturbed(e).localCheckpoint(true)).toMap
      val truth = epss.map { e =>
        e -> graft.ext.Similarity.cosineTopKAgainst(spark, emb, pq(e), 10)
          .select(col("q_id"), col("n_id")).localCheckpoint(true)
      }.toMap
      def audit(name: String, build: String => Unit): Unit = {
        val qdir = s"$dir/quant_$name"
        val tBuild = time { build(qdir) }
        val tSearch = time {
          graft.ext.Similarity.ivfTopKIndexed(spark, qdir, q,
            nProbe = 4, k = 10).write.format("noop").mode("overwrite").save()
        }
        def recall(nProbe: Int): Double = {
          val approx = graft.ext.Similarity.ivfTopKIndexed(spark, qdir, q,
            nProbe = nProbe, k = 10).select(col("q_id"), col("n_id"))
          exact.join(approx, Seq("q_id", "n_id")).count().toDouble / (nQ * 10)
        }
        def recallOff(eps: Double, nProbe: Int): Double = {
          val approx = graft.ext.Similarity.ivfTopKIndexed(spark, qdir,
            pq(eps), nProbe = nProbe, k = 10).select(col("q_id"), col("n_id"))
          truth(eps).join(approx, Seq("q_id", "n_id")).count().toDouble /
            (nQ * 10)
        }
        val off = (for (e <- epss; p <- Seq(1, 2, 4))
          yield f"ε=$e%.2f@p$p=${recallOff(e, p)}%.3f").mkString(" ")
        val cells = spark.read.parquet(s"$qdir/assigned")
          .groupBy(col("centroid_id")).agg(count(lit(1)).as("c"))
          .agg(max(col("c")), avg(col("c")), count(lit(1))).head()
        rec(s"quantizer_$name", n, tBuild,
          f"in-corpus(p4)=${recall(4)}%.3f(saturates) off-corpus: $off " +
          f"search=$tSearch%.2fs " +
          f"max_cell=${cells.getLong(0)} mean_cell=${cells.getDouble(1)}%.0f " +
          f"cells=${cells.getLong(2)}")
      }
      audit("fixed", qdir =>
        graft.ext.Similarity.writeIvfIndex(spark, emb, centPred, qdir,
          trainIters = 0)) // the audit's explicit seed arm
      var tTrain = 0.0
      var trained: Seq[(Long, Seq[Double])] = null
      tTrain = time {
        trained = graft.ext.Similarity.trainIvfCentroids(spark, emb,
          centPred, iters = 2)
      }
      rec("quantizer_train_2it", n, tTrain)
      audit("trained", qdir =>
        graft.ext.Similarity.writeIvfIndexWith(spark, emb, trained, qdir))
      // the DEFAULT build (trained + hot-cell split, writeIvfIndex with
      // no knob touched): recall must hold the trained numbers with
      // max_cell bounded — the round-13 default's acceptance row
      audit("default", qdir =>
        graft.ext.Similarity.writeIvfIndex(spark, emb, centPred, qdir))

      rmTemp(dir)
    }
    println("\n| row | 200k (s) | 2M (s) | scale-up ×10 |")
    println("|---|---|---|---|")
    results.foreach { case (row, m) =>
      val v = m.values.toSeq
      if (v.length == 2)
        println(f"| $row | ${v(0)}%.2f | ${v(1)}%.2f | ${v(1) / v(0)}%.1f× |")
    }
    spark.stop()
  }
}
