package graft.ext

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard shared by the text/dedup operators (the
  * [[Similarity]] `spread` discipline, factored out): spread a narrow
  * scan across the session's full parallelism when the source arrived
  * in fewer splits. A single parquet row group is unsplittable, so a
  * small corpus scans as ONE task and every heavy per-row expression
  * chained on it (minhash48, shingles8, winnow_keys, simhash64)
  * serializes on that task — measured at the sf0.1 bench as 0.3–1.3 s
  * single-task jobs inside q65/q72/q94/q97/q152 while 31 cores idled.
  * The round-robin repartition moves each row once, BEFORE the
  * expensive expression multiplies its cost; at production scale the
  * scan already arrives in many splits and this is a no-op (the guard
  * keeps it scale-adaptive — never a constant tuned for local mode). */
private[graft] object Par {
  def spread(df: DataFrame): DataFrame = {
    // streaming frames have no driver-inspectable rdd (the probe below
    // throws UnsupportedOperationChecker); their micro-batches arrive
    // already split by the source — pass through untouched
    if (df.isStreaming) return df
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }

  /** [[spread]] gated on the optimizer's size estimate: only worth a
    * round-robin exchange when the under-split input actually holds
    * enough work to amortize one (A/B at the sf0.1 bench: spreading a
    * 0.6 MB one-split corpus scan ahead of the minhash/simhash pass
    * cost MORE in shuffle machinery than the ~0.3 s single-task pass it
    * parallelized — q52 +0.12 s, q171 +0.63 s — while the same spread
    * is a pure win one decade up, where the pass is ~3 s and the
    * exchange still ~0.3 s). 2 MB keeps sf0.1-class fixtures on the
    * no-shuffle path and fires from the sf1-class decade upward; at
    * production scale the scan arrives in many splits and neither form
    * does anything. Callers whose input is a candidate-bounded
    * semi-join (verify sets) use the unconditional [[spread]] — their
    * per-row expressions are heavy enough that the exchange won at
    * sf0.1 already, and join stats under-estimate. */
  def spreadIfBig(df: DataFrame, minBytes: Long = 2L << 20): DataFrame = {
    if (df.isStreaming) return df // see spread
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par &&
        df.queryExecution.optimizedPlan.stats.sizeInBytes > minBytes)
      df.repartition(par)
    else df
  }
}
