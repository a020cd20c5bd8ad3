package graft.pumle

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Derived fluid-property and schedule expressions (OP-X13/X14/X15) —
  * pure `Column` arithmetic usable anywhere in a plan (codegen-friendly,
  * no UDFs). Formulas from /root/reference/simulation/co2lab3DPUMLE.m.
  */
object Physics {

  /** Driesner (2007) NaCl-solution reference density
    * (co2lab3DPUMLE.m:334-343): 58443/(23.772 + 0.018639·T − 1.9687e-6·T²)
    * with T in °C. */
  def rhoNaClRef(tempC: Column): Column =
    lit(58443.0) / (lit(23.772) + lit(0.018639) * tempC
      - lit(1.9687e-6) * tempC * tempC)

  /** Mass-fraction mix: rho_brine = rho_h2o·(1−X) + rho_NaCl·X. */
  def rhoBrine(rhoH2o: Column, tempC: Column, xNaCl: Column): Column =
    rhoH2o * (lit(1.0) - xNaCl) + rhoNaClRef(tempC) * xNaCl

  /** NaCl molality from mass fraction: m = 55.508·X/(1−X)
    * (co2lab3DPUMLE.m:348). */
  def molality(xNaCl: Column): Column =
    lit(55.508) * xNaCl / (lit(1.0) - xNaCl)

  /** Mao & Duan (2009) relative viscosity μ_brine/μ_H2O
    * (co2lab3DPUMLE.m:345-374): exp(A·m + B·m² + C·m³) with
    * T-dependent A,B,C (T in Kelvin). */
  def relativeViscosity(tempK: Column, xNaCl: Column): Column = {
    val m = molality(xNaCl)
    val a = lit(-0.21319213) + lit(0.13651589e-2) * tempK - lit(0.12191756e-5) * tempK * tempK
    val b = lit(0.69161945e-1) - lit(0.27292263e-3) * tempK + lit(0.20852448e-6) * tempK * tempK
    val c = lit(-0.25988855e-2) + lit(0.77989227e-5) * tempK
    exp(a * m + b * m * m + c * m * m * m)
  }

  /** MRST rampupTimesteps (called at co2lab3DPUMLE.m:456 with default
    * n = 8) as driver-side data. The MRST sequence is a ramp-UP of
    * small-to-target steps, not unbounded doubling:
    *   dt_init = dt0 ./ 2.^[n n n-1 ... 1]   (n+1 entries; first repeated)
    *   if any cumsum(dt_init) > T: keep only entries with cumsum < T
    *   then floor((T - sum(dt_init))/dt0) constant dt0 steps
    *   then one remainder step if positive.
    * Cumsum of the ramp is exactly dt0·2^j/2^n (dyadic — FP-exact),
    * and the full ramp sums to exactly dt0.
    * Returns (control, dt) — control 1 = injection, 2 = migration
    * (constant migration steps, co2lab3DPUMLE.m:469-476). */
  def schedule(injTime: Double, dt0: Double, migTime: Double, migSteps: Int,
      n: Int = 8): Vector[(Int, Double)] = {
    val exps = n +: (n to 1 by -1)
    val full = exps.map(e => dt0 / math.pow(2, e)).toVector
    val cs = full.scanLeft(0.0)(_ + _).tail
    val dtInit =
      if (cs.exists(_ > injTime)) full.zip(cs).filter(_._2 < injTime).map(_._1)
      else full
    val s = dtInit.sum
    val nRem = math.floor((injTime - s) / dt0).toInt
    val rem = Vector.fill(nRem)(dt0)
    val dtFinal = injTime - s - rem.sum
    val inj = dtInit ++ rem ++ (if (dtFinal > 0) Vector(dtFinal) else Vector.empty)
    inj.map((1, _)) ++ Vector.fill(migSteps)((2, migTime / migSteps))
  }
}
