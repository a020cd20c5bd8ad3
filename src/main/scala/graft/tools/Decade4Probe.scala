package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** FOURTH embeddings decade (20,000,000 × 64, Spark-only), INDEX
  * FAMILY ONLY: build / append / compact / search on the persisted IVF
  * and IVF+PQ indexes at another ×10 over Decade3Probe's ceiling. The
  * quantizer is held fixed again (2,000 centroids from ids < 200k,
  * present at every scale), so cells are 10× denser than the third
  * decade — the axis that stresses the routed cell writes, probe-time
  * rerank volume, and compaction, exactly where a 100 TB deployment
  * lives.
  *
  * DELIBERATELY SKIPPED (the no-silent-caps rule — logged at runtime
  * too): the exhaustive rows (brute-force cosine ground truth, fused
  * SQ/PQ-ADC full-corpus scans, capped near-dup pair mining). At 20M
  * they are pointlessly slow on one box and measure nothing the index
  * rows don't: their scaling story is already pinned at three decades
  * (BENCH_sfe / Decade3Probe), and their per-row work contracts are
  * linear in the corpus by construction.
  *
  * Expected shapes (a row "holds" when its ×10 scale-up tracks its
  * work contract):
  *  - ivf/pq build: narrow compiled assignment + one routed shuffle
  *    → ~×10;
  *  - search-only: fixed 201 queries × nProbe cells, each 10× denser
  *    → ~×10 rerank pairs;
  *  - append: increment-sized assignment + routed write, seen rows
  *    scanned zero times → flat in the seen size (the increment is
  *    n/20, so the row grows ~×10 with the increment, not the index);
  *  - compact: proportional to the fragmentation rewritten, bounded
  *    by the touched cells.
  *
  * Run on a quiet machine: `SPARK_GRAFT_CPUS=32 sbt "runMain
  * graft.tools.Decade4Probe"` (smaller first arg downscales, e.g.
  * 2000000 for a dry run at the third decade's ceiling). Disk: the
  * 20M assigned table is ~10 GB; both scales together need ~12 GB of
  * temp space. */
object Decade4Probe {
  def main(args: Array[String]): Unit = {
    val big = args.headOption.map(_.toLong).getOrElse(20000000L)
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
    // Decade3Probe's clustered generator, verbatim: spikes along 64
    // axes + a pseudo-random fill
    def clustered(lo: Long, hi: Long) = spark.range(lo, hi, 1, 64).select(
      col("id").as("vec_id"),
      expr("""transform(sequence(0, 63), d ->
              | CAST(CASE WHEN d = pmod(id, 64) THEN 1.0
              |       ELSE CAST(pmod(id * (d + 17), 97) AS DOUBLE) / 1940.0
              |  END AS FLOAT))""".stripMargin).as("embedding"))
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
      println(f"[decade4] $row%-22s n=$n%9d  $secs%8.2fs  $extra")
    }

    println(s"[decade4] SKIPPED at this decade (no-silent-caps): " +
      "exhaustive exact top-k, sq_search_fused, pq_adc_fused, " +
      "near_dup_ann_capped — linear-in-corpus contracts already " +
      "pinned at three decades; only the index family runs here")

    for (n <- Seq(big / 10, big)) {
      val emb = clustered(0, n)
      val dir = java.nio.file.Files.createTempDirectory(s"d4_$n").toString
      val q = queries(n).localCheckpoint(true)

      rec("ivf_build", n, time {
        graft.ext.Similarity.writeIvfIndex(spark, emb, centPred, s"$dir/ivf",
          trainIters = 0) // seed build: the decade series baseline
      }, { val f = cellFiles(s"$dir/ivf", "assigned")
           s"cells=${f.length} files/cell max=${f.max}" })

      rec("ivf_search_only", n, time {
        graft.ext.Similarity.ivfTopKIndexed(spark, s"$dir/ivf", q,
          nProbe = 4, k = 10).write.format("noop").mode("overwrite").save()
      })

      // one crawl append of n/20 (increment grows with the DECADE so
      // the row's ×10 reads the increment contract, not the seen size),
      // then probe, compact, probe
      rec("ivf_append", n, time {
        graft.ext.Similarity.appendIvfIndex(spark,
          clustered(n, n + n / 20), s"$dir/ivf")
      })
      val frag = cellFiles(s"$dir/ivf", "assigned")
      val probeFrag = time {
        graft.ext.Similarity.ivfTopKIndexed(spark, s"$dir/ivf", q,
          nProbe = 4, k = 10).write.format("noop").mode("overwrite").save()
      }
      var nComp = 0L
      rec("ivf_compact", n, time { nComp =
        graft.ext.Similarity.compactIvfIndex(spark, s"$dir/ivf") }, {
        val comp = cellFiles(s"$dir/ivf", "assigned")
        val probeComp = time {
          graft.ext.Similarity.ivfTopKIndexed(spark, s"$dir/ivf", q,
            nProbe = 4, k = 10).write.format("noop").mode("overwrite").save()
        }
        f"files/cell max ${frag.max} -> ${comp.max} ($nComp cells), " +
        f"probe $probeFrag%.2fs -> $probeComp%.2fs" })

      rec("ivfpq_build", n, time {
        graft.ext.Similarity.writeIvfPqIndexWith(spark, emb, centPred,
          graft.ext.Similarity.fixedCodebooks(), s"$dir/pq")
      }, { val f = cellFiles(s"$dir/pq", "codes")
           s"cells=${f.length} files/cell max=${f.max}" })
      rec("ivfpq_search", n, time {
        graft.ext.Similarity.ivfPqSearch(spark, s"$dir/pq", q,
          nProbe = 4, topK = 10).write.format("noop").mode("overwrite").save()
      })

      rmTemp(dir)
    }
    println(f"\n| row | ${big / 10}%d (s) | ${big}%d (s) | scale-up ×10 |")
    println("|---|---|---|---|")
    results.foreach { case (row, m) =>
      val v = m.values.toSeq
      if (v.length == 2)
        println(f"| $row | ${v(0)}%.2f | ${v(1)}%.2f | ${v(1) / v(0)}%.1f× |")
    }
    spark.stop()
  }
}
