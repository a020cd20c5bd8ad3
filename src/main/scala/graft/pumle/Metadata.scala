package graft.pumle

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Metadata flattening + declarative validation (OP-X4/V1) — the
  * reference's pandera schema (/root/reference/src/pumle/metadata.py:30-59)
  * as a library of boolean constraint columns applied in one pass.
  *
  * Column naming: `("Fluid","pres_ref")` → `fluid__pres_ref` (lower,
  * space/dash→underscore, `__` join — metadata.py:119-129).
  */
object Metadata {

  def flatName(section: String, param: String): String = {
    def norm(s: String) = s.toLowerCase.replaceAll("[ -]", "_")
    s"${norm(section)}__${norm(param)}"
  }

  /** Flatten SimConfig variants into the metadata frame: one row per
    * sim, `section__param` columns (metadata.py:264-297). */
  def frame(spark: org.apache.spark.sql.SparkSession,
      configs: Seq[SimConfig], simIds: Seq[Int]): DataFrame = {
    import spark.implicits._
    require(configs.nonEmpty)
    val cols = configs.head.sections.toSeq.flatMap { case (sec, params) =>
      params.keys.map(p => (sec, p))
    }
    val rows = configs.zip(simIds).map { case (c, id) =>
      (id.toString, cols.map { case (s, p) => c(s)(p).toString })
    }
    rows.toDF("sim_id", "vals")
      .select(col("sim_id") +: cols.zipWithIndex.map { case ((s, p), i) =>
        col("vals").getItem(i).as(flatName(s, p))
      }: _*)
  }

  /** The declared checks (metadata.py:30-59): (name, required column,
    * predicate). A row passes when every applicable predicate holds. */
  val checks: Seq[(String, String, Column)] = Seq(
    ("sim_id_digits", "sim_id", col("sim_id").rlike("^\\d+$")),
    ("pres_ref_pos", "fluid__pres_ref", col("fluid__pres_ref").cast("double") > 0),
    ("temp_ref_pos", "fluid__temp_ref", col("fluid__temp_ref").cast("double") > 0),
    ("cp_rock_pos", "fluid__cp_rock", col("fluid__cp_rock").cast("double") > 0),
    ("srw_unit", "fluid__srw", col("fluid__srw").cast("double").between(0, 1)),
    ("src_unit", "fluid__src", col("fluid__src").cast("double").between(0, 1)),
    ("pe_pos", "fluid__pe", col("fluid__pe").cast("double") > 0),
    ("xnacl_nonneg", "fluid__xnacl", col("fluid__xnacl").cast("double") >= 0),
    ("rho_h2o_pos", "fluid__rho_h2o", col("fluid__rho_h2o").cast("double") > 0),
    ("sw0_unit", "initial_conditions__sw_0", col("initial_conditions__sw_0").cast("double").between(0, 1)),
    ("co2_inj_pos", "wells__co2_inj", col("wells__co2_inj").cast("double") > 0),
  )

  /** Violation report: one row per failed (row, check); empty ⇒ valid.
    * One narrow pass — the `violations` array never materializes rows
    * that pass. */
  def violations(meta: DataFrame): DataFrame = {
    val applicable = checks.collect {
      case (name, req, pred) if meta.columns.contains(req) => (name, pred)
    }
    val vio = array(applicable.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name))
    }: _*)
    meta
      .withColumn("violation", explode(filter(vio, _.isNotNull)))
      .select(col("sim_id"), col("violation"))
  }

  /** Fail-fast validation like pandera's schema.validate
    * (metadata.py:302-317). */
  def validate(meta: DataFrame): Unit = {
    val bad = violations(meta).limit(20).collect()
    require(bad.isEmpty,
      "metadata validation failed: " +
        bad.map(r => s"sim ${r.getString(0)}: ${r.getString(1)}").mkString("; "))
  }
}
