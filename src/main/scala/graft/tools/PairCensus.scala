package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Pair-volume census for the capped winnow chains at scale — the
  * measurement that turns a scale-table reading like "q137 ×22 at ×10
  * rows" from argument into decomposition: candidate/verified pair
  * counts for the q137 (corpus) and q152 (incremental) fixtures at
  * `SPARK_GRAFT_SF_DIR`, one JSON line each. Pair counts growing with
  * fixture density while (wall / verified-pair) holds flat confirms
  * the chain is pair-bounded; a flat census under a growing wall means
  * the PLAN regressed. Counts come from the operators' own stage
  * frames ([[graft.ext.Dedup.winnowCorpusPairCensus]] /
  * [[graft.ext.Dedup.winnowIncrementalPairCensus]] — shared
  * construction, not a replica). Driven by tools/bench_sf3.py's
  * census table. */
object PairCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 131072)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.Functions.registerAll(spark)
    val docs = graft.core.Tables.documents(spark, sfDir)

    // q137's fixture: the whole documents table through the corpus chain
    val t0 = System.nanoTime()
    val c = graft.ext.Dedup.winnowCorpusPairCensus(spark, docs).head()
    val w0 = (System.nanoTime() - t0) / 1e9
    println(s"""[paircensus] {"chain":"q137_corpus","n_docs":${c.getLong(0)},""" +
      s""""n_exact_survivors":${c.getLong(1)},"n_candidates":${c.getLong(2)},""" +
      s""""n_verified":${c.getLong(3)},"census_wall_s":${f"$w0%.1f"}}""")

    // q152's fixture: seen = doc_id % 3 != 0 (checkpointed snapshot —
    // the registry query's materialized-artifact stand-in), fresh = the
    // remaining third
    val seenSnap = graft.ext.Dedup.winnowSnapshot(spark,
        docs.filter(col("doc_id") % 3 =!= 0))
      .localCheckpoint(true)
    val t1 = System.nanoTime()
    val i = graft.ext.Dedup.winnowIncrementalPairCensus(spark,
      docs.filter(col("doc_id") % 3 === 0), seenSnap).head()
    val w1 = (System.nanoTime() - t1) / 1e9
    println(s"""[paircensus] {"chain":"q152_incremental","n_new":${i.getLong(0)},""" +
      s""""n_exact_survivors":${i.getLong(1)},"n_candidates":${i.getLong(2)},""" +
      s""""n_verified":${i.getLong(3)},"census_wall_s":${f"$w1%.1f"}}""")
    spark.stop()
  }
}
