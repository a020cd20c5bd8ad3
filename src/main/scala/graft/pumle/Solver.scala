package graft.pumle

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pumle.export.Mat5

/** Entry-point-A execution surface (SURVEY §3.1): distributed staging
  * writes and solver dispatch.
  *
  * The reference fans out with OpenMP `schedule(dynamic)` over staging
  * dirs (simulation/simulation.cpp:127-145), one Octave process per
  * sim. Here Spark's task scheduler IS the fan-out: one task per
  * staging dir, `Process` per task for the external solver, dynamic
  * scheduling/locality/speculation for free. The solver itself stays a
  * pluggable boundary — any command receiving the staging dir path.
  *
  * Deployment note: `stagingRoot` must be SHARED storage (NFS/Lustre/
  * fuse-mounted object store) on a multi-node cluster — staging files
  * and `completed.flag` are plain filesystem artifacts written by
  * whichever executor runs the task, and dispatch tasks have no
  * locality to the writing executor. (The reference has the same
  * contract on one node; local mode satisfies it trivially.)
  */
object Solver {

  /** The full per-variant section set the solver contract requires
    * (co2lab3DPUMLE.m:34-44 loads ALL sections — Paths, Grid, Schedule,
    * … — before its sanity checks): every section of `base` with Fluid
    * overridden by the variant's params (pumle.py:180-196) and SimNums
    * augmented with sim_id / sim_hash / staging_folder
    * (pumle.py:205-209; SimNums is a float-cast section, so sim_id is
    * written as a double). Base key order is preserved, extra variant
    * params append — python dict-update order. */
  def sectionsFor(base: SimConfig, v: Sweep.Variant): Seq[(String, Seq[(String, Any)])] = {
    import scala.collection.immutable.ListMap
    val fluidBase = base("Fluid")
    val fluid =
      if (fluidBase.isEmpty) ListMap.from(v.params.toSeq.sortBy(_._1))
      else fluidBase.map { case (k, old) => k -> v.params.getOrElse(k, old) } ++
        ListMap.from(v.params.view.filterKeys(!fluidBase.contains(_)).toSeq.sortBy(_._1))
    val simNums = base("SimNums") ++ ListMap[String, Any](
      "sim_id" -> v.simId.toDouble,
      "sim_hash" -> v.simHash,
      "staging_folder" -> s"staging_${v.simHash}")
    base.sections
      .updated("Fluid", fluid)
      .updated("SimNums", simNums)
      .toSeq.map { case (s, m) => s -> m.toSeq }
  }

  /** Distributed staging write: each task writes its variants'
    * `staging_<hash>/<Section>_<hash>.mat` files (the reference's
    * layout, pumle.py:209 / mat_files.py:118-134) — one file per
    * config section, one top-level variable per param (scipy savemat
    * layout). `base` supplies the non-Fluid sections; with the default
    * empty base only Fluid + SimNums are written. Returns the staging
    * dir per variant. */
  def writeStaging(spark: SparkSession, variants: Seq[Sweep.Variant],
      stagingRoot: String,
      base: SimConfig = SimConfig(scala.collection.immutable.ListMap.empty),
      parallelism: Int = 0): Seq[String] = {
    val par = if (parallelism > 0) parallelism
      else math.min(variants.length, spark.sparkContext.defaultParallelism)
    if (variants.isEmpty) return Seq.empty
    spark.sparkContext
      .parallelize(variants.map(v => (v, sectionsFor(base, v))), math.max(par, 1))
      .map { case (v, sections) =>
        val dir = s"$stagingRoot/staging_${v.simHash}"
        Mat5.writeStaging(dir, v.simHash, sections)
        dir
      }
      .collect().toSeq
  }

  final case class RunResult(stagingDir: String, exitCode: Int, skipped: Boolean)

  /** Dispatch the external solver over staging dirs: one Spark task per
    * dir, `completed.flag` skip semantics (simulation.cpp:14-20), one
    * external process per task (`cmd stagingDir`). The solver writes
    * its own outputs (bronze JSONs); we record exit codes. */
  def dispatch(spark: SparkSession, stagingDirs: Seq[String],
      cmd: Seq[String]): Seq[RunResult] = {
    if (stagingDirs.isEmpty) return Seq.empty
    spark.sparkContext
      .parallelize(stagingDirs, stagingDirs.length) // schedule(dynamic) analog
      .map { dir =>
        val flag = new java.io.File(dir, "completed.flag")
        if (flag.exists) RunResult(dir, 0, skipped = true)
        else {
          val pb = new ProcessBuilder((cmd :+ dir): _*)
          pb.redirectErrorStream(true)
          val proc = pb.start()
          val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
          val code = proc.waitFor()
          if (code == 0) {
            java.nio.file.Files.writeString(flag.toPath, "done\n")
          } else {
            System.err.println(s"[solver] $dir exit=$code: ${out.take(500)}")
          }
          RunResult(dir, code, skipped = false)
        }
      }
      .collect().toSeq
  }

  /** Full entry-point-A drive: sweep → catalog upsert (CREATED) →
    * staging → dispatch → status COMPLETED/FAILED per result. Returns
    * the updated catalog. */
  def runSimulations(spark: SparkSession, catalog: DataFrame,
      variants: Seq[Sweep.Variant], stagingRoot: String,
      cmd: Seq[String],
      base: SimConfig = SimConfig(scala.collection.immutable.ListMap.empty)): (DataFrame, Seq[RunResult]) = {
    val cat1 = Catalog.upsert(catalog, Catalog.rowsFor(spark, variants))
    val dirs = writeStaging(spark, variants, stagingRoot, base)
    val results = dispatch(spark, dirs, cmd)
    val byHash = results.map(r =>
      r.stagingDir.split("staging_").last -> r).toMap
    val fresh = variants.filter(v => byHash.get(v.simHash).exists(!_.skipped))
    val (ok, failed) = fresh.partition(v => byHash(v.simHash).exitCode == 0)
    var cat = cat1
    // re-queue previously FAILED sims first (the only legal exit from
    // FAILED is back to CREATED) so retries don't trip the state machine
    val freshHashes = fresh.map(_.simHash)
    val previouslyFailed = cat
      .filter(org.apache.spark.sql.functions.col("status") === Catalog.Status.Failed &&
        org.apache.spark.sql.functions.col("sim_hash").isin(freshHashes: _*))
      .select("sim_hash").collect().map(_.getString(0)).toSeq
    if (previouslyFailed.nonEmpty)
      cat = Catalog.setStatus(cat, previouslyFailed, Catalog.Status.Created)
    if (fresh.nonEmpty)
      cat = Catalog.setStatus(cat, freshHashes, Catalog.Status.Running)
    if (ok.nonEmpty)
      cat = Catalog.setStatus(cat, ok.map(_.simHash), Catalog.Status.Completed)
    if (failed.nonEmpty)
      cat = Catalog.setStatus(cat, failed.map(_.simHash), Catalog.Status.Failed)
    (cat, results)
  }
}
