package graft.pumle

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Simulation catalog (OP-S8/J2/V6) — the reference's SQLite
  * `simulations` table (/root/reference/src/pumle/db.py:15-23) as a
  * parquet-backed Spark table with the same DDL shape:
  * `(sim_hash PK, sim_id, fluid_params, status, created_at)`.
  *
  *  - `INSERT OR IGNORE` (db.py:25-28) = left-anti-join append — the
  *    engine's idempotent-upsert primitive; at scale it is one shuffle
  *    on the (uniform) hash key.
  *  - Status enum + transitions (db.py:43-47, pumle.py:248-262) are
  *    enforced engine-side; invalid transitions throw (OP-V6).
  *  - The CLI's raw SQL (`main.py:129`) runs verbatim via a registered
  *    temp view.
  */
object Catalog {

  object Status {
    val Created = "CREATED"
    val Running = "RUNNING"
    val Completed = "COMPLETED"
    val Failed = "FAILED"
    val all: Set[String] = Set(Created, Running, Completed, Failed)
    /** Legal transitions (pumle.py:248-262; terminal states sink). */
    val transitions: Map[String, Set[String]] = Map(
      Created -> Set(Running, Failed),
      Running -> Set(Completed, Failed),
      Completed -> Set.empty,
      Failed -> Set(Created) // re-queue after failure
    )
  }

  def empty(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Int, String, String, java.sql.Timestamp)]
      .toDF("sim_hash", "sim_id", "fluid_params", "status", "created_at")
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val p = new java.io.File(path)
    if (p.exists) spark.read.parquet(path) else empty(spark)
  }

  /** Rows for a set of sweep variants, fluid_params serialized with the
    * reference's canonical JSON (db.py stores `str(dict)`; we store the
    * canonical form our hash is computed from, parseable with
    * `from_json`). */
  def rowsFor(spark: SparkSession, variants: Seq[Sweep.Variant]): DataFrame = {
    import spark.implicits._
    variants.map(v => (v.simHash, v.simId, PyJson.canonicalJson(v.params), Status.Created))
      .toDF("sim_hash", "sim_id", "fluid_params", "status")
      .withColumn("created_at", current_timestamp())
  }

  /** INSERT OR IGNORE: append only sim_hashes not already present. */
  def upsert(existing: DataFrame, incoming: DataFrame): DataFrame =
    existing.unionByName(
      incoming.join(existing.select("sim_hash"), Seq("sim_hash"), "left_anti"))

  /** Validated status transition for a set of hashes (OP-V6). Throws on
    * an illegal transition like the reference's guard (db.py:144-145). */
  def setStatus(catalog: DataFrame, hashes: Seq[String], to: String): DataFrame = {
    require(Status.all.contains(to), s"invalid status: $to")
    val illegal = catalog
      .filter(col("sim_hash").isin(hashes: _*))
      .select(col("status")).distinct().collect()
      .map(_.getString(0))
      .filterNot(from => Status.transitions(from).contains(to))
    require(illegal.isEmpty,
      s"illegal transition ${illegal.mkString(",")} -> $to")
    catalog.withColumn("status",
      when(col("sim_hash").isin(hashes: _*), lit(to)).otherwise(col("status")))
  }

  /** Write-to-temp-then-swap: the updated catalog plan usually READS the
    * current `path` (upsert/setStatus are lazy) — a direct overwrite
    * would delete its own input mid-job. Atomic-ish swap also keeps a
    * readable catalog if the writing job dies. */
  def write(catalog: DataFrame, path: String): Unit = {
    val tmp = s"$path.tmp-${java.util.UUID.randomUUID().toString.take(8)}"
    catalog.write.mode(SaveMode.Overwrite).parquet(tmp)
    val dst = new java.io.File(path)
    if (dst.exists) {
      val trash = new java.io.File(s"$path.old")
      if (trash.exists) delete(trash)
      dst.renameTo(trash)
      delete(trash)
    }
    new java.io.File(tmp).renameTo(dst)
  }

  private def delete(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(delete))
    f.delete()
  }

  /** Register for verbatim SQL (`SELECT sim_hash, sim_id, fluid_params,
    * status FROM simulations` — main.py:129). */
  def registerView(spark: SparkSession, catalog: DataFrame): Unit =
    catalog.createOrReplaceTempView("simulations")
}
