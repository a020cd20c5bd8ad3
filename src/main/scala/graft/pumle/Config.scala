package graft.pumle

import scala.collection.immutable.ListMap

/** Parameter configuration layer (OP-S1/X5/X12/V5).
  *
  * Mirrors the reference's declared schema
  * (/root/reference/src/pumle/pumle.py:35-67): ten sections, each with a
  * parameter whitelist and a float-cast flag, parsed from an INI file
  * (/root/reference/src/pumle/ini.py:108-158). `_flag`-suffixed params
  * become booleans (ini.py:102-103).
  *
  * Values are kept per-section as `Any` (String | Double | Boolean) with
  * ordered keys; `SimConfig` is small driver-side data that seeds the
  * distributed sweep (graft.pumle.Sweep).
  */
final case class SimConfig(sections: ListMap[String, ListMap[String, Any]]) {
  def apply(section: String): ListMap[String, Any] =
    sections.getOrElse(section, ListMap.empty)
  def fluid: Map[String, Any] = apply("Fluid")
  def updated(section: String, param: String, value: Any): SimConfig =
    SimConfig(sections.updated(section, apply(section).updated(param, value)))
  /** sim_hash over the Fluid section (pumle.py:202). */
  def simHash: String = PyJson.paramHash(fluid)
}

object Config {

  /** (params, castToFloat) per section — pumle.py:35-67. */
  val schema: ListMap[String, (Seq[String], Boolean)] = ListMap(
    "Paths" -> (Seq("PUMLE_ROOT", "PUMLE_RESULTS"), false),
    "Pre-Processing" -> (Seq("case_name", "file_basename", "model_name"), false),
    "Grid" -> (Seq("file_path", "repair_flag"), false),
    "Fluid" -> (Seq("pres_ref", "temp_ref", "cp_rock", "srw", "src", "pe",
      "XNaCl", "rho_h2o"), true),
    "Initial Conditions" -> (Seq("sw_0"), true),
    "Boundary Conditions" -> (Seq("type"), false),
    "Wells" -> (Seq("CO2_inj"), true),
    "Schedule" -> (Seq("injection_time", "migration_time", "injection_timesteps",
      "migration_timesteps", "injection_rampup_dt_initial"), true),
    "EXECUTION" -> (Seq("octave", "mrst_root"), false),
    "SimNums" -> (Seq("sim_id"), true),
  )

  /** Physical limits table (parameters.py:36-45): param → (min, max). */
  val physicalLimits: Map[String, (Double, Double)] = Map(
    "pres_ref" -> (1.0, 100.0),   // MPa
    "temp_ref" -> (0.0, 200.0),   // °C
    "cp_rock"  -> (1e-6, 1e-3),   // 1/bar
    "srw"      -> (0.0, 0.3),
    "src"      -> (0.0, 0.3),
    "pe"       -> (0.1, 10.0),    // kPa
    "XNaCl"    -> (0.0, 0.2),
    "rho_h2o"  -> (900.0, 1200.0) // kg/m³
  )

  /** Cast per ini.py:85-106: float sections via float(value); `_flag`
    * suffix → boolean; else string. */
  private def castValue(param: String, raw: String, toFloat: Boolean): Any =
    if (param.toLowerCase.endsWith("_flag")) {
      Seq("true", "1", "yes", "on").contains(raw.trim.toLowerCase)
    } else if (toFloat) raw.trim.toDouble
    else raw.trim

  /** Minimal INI parse (configparser semantics the reference relies on:
    * [Section] headers, key = value / key: value, # and ; comments,
    * case-preserved section names, lowercased keys are NOT applied —
    * the reference uses raw keys). Only schema-listed params are kept
    * (ini.py:126-148). */
  def parseIni(text: String): SimConfig = {
    var current: Option[String] = None
    val acc = scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.LinkedHashMap[String, Any]]()
    for (line0 <- text.linesIterator) {
      val line = line0.trim
      if (line.nonEmpty && !line.startsWith("#") && !line.startsWith(";")) {
        if (line.startsWith("[") && line.endsWith("]")) {
          current = Some(line.substring(1, line.length - 1).trim)
        } else current.foreach { sec =>
          schema.get(sec).foreach { case (params, toFloat) =>
            val kv = line.split("[=:]", 2)
            if (kv.length == 2) {
              // configparser lowercases option names on BOTH read and
              // get (default optionxform), so INI keys match the schema
              // case-insensitively and the dict carries the SCHEMA
              // spelling (which is what the reference hashes).
              val fileKey = kv(0).trim.toLowerCase
              params.find(_.toLowerCase == fileKey).foreach { schemaKey =>
                acc.getOrElseUpdate(sec, scala.collection.mutable.LinkedHashMap())
                  .update(schemaKey, castValue(schemaKey, kv(1), toFloat))
              }
            }
          }
        }
      }
    }
    SimConfig(ListMap.from(acc.map { case (k, v) => k -> ListMap.from(v) }))
  }

  /** OP-V5: validate Fluid params against physical limits; returns
    * violations as (param, value, lo, hi). Fail-fast wrapper below. */
  def limitViolations(params: Map[String, Any]): Seq[(String, Double, Double, Double)] =
    params.toSeq.sortBy(_._1).flatMap {
      case (k, v: Double) =>
        physicalLimits.get(k).collect {
          case (lo, hi) if v < lo || v > hi => (k, v, lo, hi)
        }
      case _ => None
    }

  def validateLimits(params: Map[String, Any]): Unit = {
    val bad = limitViolations(params)
    require(bad.isEmpty,
      bad.map { case (k, v, lo, hi) => s"$k=$v outside [$lo, $hi]" }.mkString("; "))
  }

  /** Variation bounds (parameters.py:99-115): clamp base·(1∓δ) into the
    * physical limits. */
  def variationRange(param: String, base: Double, delta: Double): (Double, Double) = {
    val (lo, hi) = physicalLimits.getOrElse(param, (Double.NegativeInfinity, Double.PositiveInfinity))
    (math.max(lo, base * (1 - delta)), math.min(hi, base * (1 + delta)))
  }
}
