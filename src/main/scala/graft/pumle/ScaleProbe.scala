package graft.pumle

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput probe at the reference's REAL per-sim scale: the
  * UNISIM-I-D grid (81×58×20 = 93,960 cells) × 24 timesteps × 3 fields
  * ≈ 6.8M golden cell-state rows per simulation (BASELINE.md). Sims are
  * embarrassingly parallel (partitioned by sim_hash), so per-sim
  * throughput × executor count is the cluster throughput — this probe
  * is the honest single-node number 100 TB planning starts from.
  *
  * Bronze is synthesized in-memory (generated columns, no disk JSON) so
  * the probe measures the gather→golden→QA pipeline, not the JSON
  * parser. Run: sbt "runMain graft.pumle.ScaleProbe [nSims]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val nSims = args.headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val (ii, jj, kk) = (81, 58, 20)
    val nCells = ii * jj * kk
    val nT = 24

    // synthetic silver: (sim_hash, t, cell_idx, pressure, sw, sg) for
    // nSims × 24 × 93,960 rows, one generated partition per (sim, t)
    val silver = spark.range(0, nSims.toLong * nT, 1, nSims * 4)
      .select(
        format_string("%08x", (col("id") / nT).cast("int")).as("sim_hash"),
        (col("id") % nT).cast("int").as("t"))
      .withColumn("cell_idx", explode(sequence(lit(0), lit(nCells - 1))))
      .withColumn("pressure",
        lit(200.0) + pmod(col("cell_idx").cast("long") * 7919L, lit(1000L)) / 10.0)
      .withColumn("sg",
        pmod(col("cell_idx").cast("long") * 104729L + col("t"), lit(100L)) / 100.0)
      .withColumn("sw", lit(1.0) - col("sg"))

    val t0 = System.nanoTime()
    val golden = Pipeline.golden(silver, (ii, jj, kk))
    val qa = Pipeline.describeGolden(golden).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    val rows = nSims.toLong * nT * nCells * 3
    println(f"[probe] sims=$nSims rows=${rows / 1e6}%.1fM golden+QA in $secs%.1fs " +
      f"= ${rows / secs / 1e6}%.1fM rows/s (${qa.length} QA rows)")

    // plume query over the golden long form (the SURVEY §7.2 flagship)
    val t1 = System.nanoTime()
    val plume = golden
      .filter(col("field") === "gas_saturation" && col("t") === nT - 1 &&
        col("value") > 0.75)
      .count()
    println(f"[probe] plume query (sg>0.75, final t): $plume cells in ${(System.nanoTime() - t1) / 1e9}%.1fs")

    // dedup path at volume: 200k synthetic ~300-char docs through the
    // minhash48 signature + LSH banding (the 100 TB near-dup pipeline)
    val nDocs = 200000
    val docs = spark.range(nDocs).select(
      col("id").as("doc_id"),
      // ~25% of docs share a text with id-1 → real near-dup signal
      concat_ws(" ", (0 until 40).map(w =>
        concat(lit(s"w$w"), pmod(col("id") - (col("id") % 4) / 3 + w, lit(997)))): _*)
        .as("text"))
    val t2 = System.nanoTime()
    val cands = graft.ext.Dedup.lshCandidates(spark, docs).count()
    val secs2 = (System.nanoTime() - t2) / 1e9
    println(f"[probe] dedup: $nDocs%d docs → $cands candidate pairs in $secs2%.1fs " +
      f"= ${nDocs / secs2 / 1000}%.0fk docs/s")
    spark.stop()
  }
}
