package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import QUtil._

/** Physics-formula operators (SURVEY.md §2.6 OP-X13/X14/X15): the derived
  * fluid-property and schedule computations PUMLE delegates to the MRST
  * solver, re-expressed as pure Spark column arithmetic so configs can be
  * enriched without Octave. Formulas cited from
  * /root/reference/simulation/co2lab3DPUMLE.m. All narrow (no shuffle);
  * transcendental-bearing results are rounded to 9 decimals on both sides
  * so libm ULP differences between JVM and DuckDB cannot flip the compare.
  */
object PhysicsQueries {

  // ---------------------------------------------------------------- q40
  // OP-X13: Driesner (2007) brine density (co2lab3DPUMLE.m:334-343):
  //   rho_NaCl0 = 58443/(23.772 + 0.018639·T − 1.9687e-6·T²)
  //   mix: rhow = rho_H2O·(1−X) + rho_NaCl·X  (pressure-corrected ref mix)
  // Rational arithmetic only → bit-identical across engines, no rounding.
  private val q40 = Q(
    "q40_brine_density",
    (s, d) => {
      val t = (col("c_acctbal") / 55.0 + 50.0).as("temp_c") // ~[50,250) °C-ish
      val x = ((col("c_custkey") % 20).cast("double") / 100.0).as("xnacl")
      Tables.customer(s, d)
        .select(col("c_custkey"), t, x)
        .withColumn("rho_nacl0",
          lit(58443.0) / (lit(23.772) + lit(0.018639) * col("temp_c")
            - lit(1.9687e-6) * col("temp_c") * col("temp_c")))
        .withColumn("rho_brine",
          lit(1000.0) * (lit(1.0) - col("xnacl")) + col("rho_nacl0") * col("xnacl"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey,
        c_acctbal / 55.0 + 50.0 AS temp_c,
        CAST(c_custkey % 20 AS DOUBLE) / 100.0 AS xnacl,
        58443.0 / (23.772 + 0.018639 * (c_acctbal / 55.0 + 50.0)
                   - 1.9687e-6 * (c_acctbal / 55.0 + 50.0) * (c_acctbal / 55.0 + 50.0)) AS rho_nacl0,
        1000.0 * (1.0 - CAST(c_custkey % 20 AS DOUBLE) / 100.0)
          + 58443.0 / (23.772 + 0.018639 * (c_acctbal / 55.0 + 50.0)
                       - 1.9687e-6 * (c_acctbal / 55.0 + 50.0) * (c_acctbal / 55.0 + 50.0))
            * (CAST(c_custkey % 20 AS DOUBLE) / 100.0) AS rho_brine
      FROM customer ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q41
  // OP-X14: Mao & Duan (2009) relative brine viscosity
  // (co2lab3DPUMLE.m:345-374): molality m = 55.508·X/(1−X);
  //   ln(μ_rel) = A·m + B·m² + C·m³ with T-dependent A,B,C.
  // exp/ln go through libm → round to 9 decimals on both sides.
  private val q41 = Q(
    "q41_brine_viscosity",
    (s, d) => {
      val tK = (col("c_acctbal") / 55.0 + 300.0) // Kelvin-ish range
      val x = (col("c_custkey") % 15).cast("double") / 100.0
      val m = lit(55.508) * x / (lit(1.0) - x)
      val a = lit(-0.21319213) + lit(0.13651589e-2) * tK - lit(0.12191756e-5) * tK * tK
      val b = lit(0.69161945e-1) - lit(0.27292263e-3) * tK + lit(0.20852448e-6) * tK * tK
      val c = lit(-0.25988855e-2) + lit(0.77989227e-5) * tK
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          round(m, 9).as("molality"),
          round(exp(a * m + b * m * m + c * m * m * m), 9).as("mu_rel"))
        .orderBy(col("c_custkey"))
    },
    Some("""WITH b AS (
        SELECT c_custkey,
          c_acctbal / 55.0 + 300.0 AS tk,
          55.508 * (CAST(c_custkey % 15 AS DOUBLE) / 100.0)
            / (1.0 - CAST(c_custkey % 15 AS DOUBLE) / 100.0) AS m
        FROM customer)
      SELECT c_custkey, round(m, 9) AS molality,
        round(exp((-0.21319213 + 0.13651589e-2 * tk - 0.12191756e-5 * tk * tk) * m
                + (0.69161945e-1 - 0.27292263e-3 * tk + 0.20852448e-6 * tk * tk) * m * m
                + (-0.25988855e-2 + 0.77989227e-5 * tk) * m * m * m), 9) AS mu_rel
      FROM b ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q42
  // OP-X15: MRST rampupTimesteps (co2lab3DPUMLE.m:456, default n=8).
  // Actual MRST semantics (see Physics.schedule): ramp of SMALL steps
  // dt0/2^[8 8 7..1] (truncated where cumsum >= T), then floor
  // ((T-ramp)/dt0) constant dt0 steps, then a positive remainder step;
  // then constant migration steps; control = 1 (injection) / 2
  // (migration). The ramp cumsum has the closed form dt0·2^j/256 —
  // an exact power-of-two scaling of dt0 in IEEE double, so the
  // truncation compare and floor() are bit-identical across engines.
  private val q42 = Q(
    "q42_rampup_schedule",
    (s, d) => {
      val sims = Tables.nation(s, d).select(
        col("n_nationkey").as("sim_id"),
        (lit(1.0) + (col("n_nationkey") % 3).cast("double")).as("inj_time"),
        (lit(0.5) + (col("n_nationkey") % 5).cast("double")).as("dt0"),
        (lit(4L) + col("n_nationkey") % 4).as("mig_steps"),
        (lit(2.0) + (col("n_nationkey") % 2).cast("double")).as("mig_time"))
      // ramp entries j=0..8: exponent 8 for j=0 (MRST repeats the first
      // entry), else 9-j; cumsum(j) = dt0·2^j/256 exactly; the full ramp
      // sums to exactly dt0, so "any cumsum > T" ⟺ dt0 > T.
      val ramp = sims
        .withColumn("j", explode(sequence(lit(0), lit(8))))
        .withColumn("dt", col("dt0") / pow(lit(2.0),
          when(col("j") === 0, lit(8.0)).otherwise(lit(9.0) - col("j").cast("double"))))
        .withColumn("cs", col("dt0") * pow(lit(2.0), col("j").cast("double")) / 256.0)
        .filter(col("dt0") <= col("inj_time") || col("cs") < col("inj_time"))
      val rampAgg = ramp.groupBy(col("sim_id"))
        .agg(max(col("cs")).as("ramp_sum"), count(lit(1)).as("n_ramp"))
      val base = sims.join(rampAgg, Seq("sim_id"), "left")
        .withColumn("ramp_sum", coalesce(col("ramp_sum"), lit(0.0)))
        .withColumn("n_ramp", coalesce(col("n_ramp"), lit(0L)))
        .withColumn("dt_left", col("inj_time") - col("ramp_sum"))
        .withColumn("n_rem", floor(col("dt_left") / col("dt0")))
      val rampSteps = ramp.select(col("sim_id"), lit(1L).as("control"),
        col("j").cast("long").as("step"), round(col("dt"), 9).as("dt"))
      // INVARIANT: the 0..63 enumeration must exceed max n_rem =
      // floor(max inj_time / min dt0) = floor(3.0/0.5) = 6 for this
      // data shape (10× margin; the oracle shares the same bound, so a
      // shape change that overflows it would truncate BOTH sides
      // silently — keep them in lockstep). Physics.schedule, the
      // driver-side form, is uncapped.
      val remSteps = base
        .withColumn("k", explode(sequence(lit(0L), lit(63L))))
        .filter(col("k") < col("n_rem"))
        .select(col("sim_id"), lit(1L).as("control"),
          (col("n_ramp") + col("k")).as("step"), round(col("dt0"), 9).as("dt"))
      val finalStep = base
        .withColumn("dt_final", col("dt_left") - col("n_rem").cast("double") * col("dt0"))
        .filter(col("dt_final") > 0)
        .select(col("sim_id"), lit(1L).as("control"),
          (col("n_ramp") + col("n_rem")).as("step"), round(col("dt_final"), 9).as("dt"))
      val mig = sims
        .withColumn("i", explode(sequence(lit(0L), col("mig_steps") - 1)))
        .select(col("sim_id"), lit(2L).as("control"), col("i").as("step"),
          round(col("mig_time") / col("mig_steps").cast("double"), 9).as("dt"))
      rampSteps.unionAll(remSteps).unionAll(finalStep).unionAll(mig)
        .orderBy(col("sim_id"), col("control"), col("step"))
    },
    Some("""WITH sims AS (
        SELECT n_nationkey AS sim_id,
               1.0 + CAST(n_nationkey % 3 AS DOUBLE) AS inj_time,
               0.5 + CAST(n_nationkey % 5 AS DOUBLE) AS dt0,
               4 + n_nationkey % 4 AS mig_steps,
               2.0 + CAST(n_nationkey % 2 AS DOUBLE) AS mig_time
        FROM nation),
      ramp AS (
        SELECT sim_id, inj_time, dt0,
               CAST(g.generate_series AS BIGINT) AS j,
               dt0 / pow(2.0, CASE WHEN g.generate_series = 0 THEN 8.0
                              ELSE 9.0 - CAST(g.generate_series AS DOUBLE) END) AS dt,
               dt0 * pow(2.0, CAST(g.generate_series AS DOUBLE)) / 256.0 AS cs
        FROM sims, generate_series(0, 8) g
        WHERE dt0 <= inj_time
           OR dt0 * pow(2.0, CAST(g.generate_series AS DOUBLE)) / 256.0 < inj_time),
      rampagg AS (
        SELECT sim_id, max(cs) AS ramp_sum, CAST(count(*) AS BIGINT) AS n_ramp
        FROM ramp GROUP BY sim_id),
      base AS (
        SELECT s.sim_id, s.inj_time, s.dt0,
               coalesce(r.ramp_sum, 0.0) AS ramp_sum,
               coalesce(r.n_ramp, 0) AS n_ramp,
               s.inj_time - coalesce(r.ramp_sum, 0.0) AS dt_left,
               CAST(floor((s.inj_time - coalesce(r.ramp_sum, 0.0)) / s.dt0) AS BIGINT) AS n_rem
        FROM sims s LEFT JOIN rampagg r USING (sim_id)),
      rampsteps AS (
        SELECT sim_id, CAST(1 AS BIGINT) AS control, j AS step,
               round(dt, 9) AS dt FROM ramp),
      remsteps AS (
        SELECT sim_id, CAST(1 AS BIGINT) AS control,
               n_ramp + CAST(g.generate_series AS BIGINT) AS step,
               round(dt0, 9) AS dt
        FROM base, generate_series(0, 63) g
        WHERE g.generate_series < n_rem),
      finalstep AS (
        SELECT sim_id, CAST(1 AS BIGINT) AS control,
               n_ramp + n_rem AS step,
               round(dt_left - CAST(n_rem AS DOUBLE) * dt0, 9) AS dt
        FROM base WHERE dt_left - CAST(n_rem AS DOUBLE) * dt0 > 0),
      mig AS (
        SELECT sim_id, CAST(2 AS BIGINT) AS control,
               CAST(g.generate_series AS BIGINT) AS step,
               round(mig_time / CAST(mig_steps AS DOUBLE), 9) AS dt
        FROM sims, generate_series(0, 7) g
        WHERE g.generate_series <= mig_steps - 1)
      SELECT * FROM rampsteps UNION ALL SELECT * FROM remsteps
      UNION ALL SELECT * FROM finalstep UNION ALL SELECT * FROM mig
      ORDER BY sim_id, control, step"""))

  // ---------------------------------------------------------------- q43
  // OP-W1 + OP-X16 analog: label each timestep with cumulative physical
  // time (prefix-sum window per sim — the golden-table time axis).
  private val q43 = Q(
    "q43_timestep_labels",
    (s, d) => {
      val w = Window.partitionBy(col("sim_id"))
        .orderBy(col("t")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 100 < 4)
        .select(
          (col("o_custkey") % 50).as("sim_id"),
          (col("o_orderkey") % 24).cast("long").as("t"),
          (col("o_totalprice") / 1e6).as("dt"))
        .groupBy(col("sim_id"), col("t")).agg(dsum(col("dt")).as("dt"))
        .withColumn("elapsed", round(sum(col("dt")).over(w), 6))
        .withColumn("dt", round(col("dt"), 6))
        .orderBy(col("sim_id"), col("t"))
    },
    Some("""WITH g AS (
        SELECT o_custkey % 50 AS sim_id, CAST(o_orderkey % 24 AS BIGINT) AS t,
          CAST(sum(CAST(o_totalprice / 1e6 AS DECIMAL(18,6))) AS DOUBLE) AS dt
        FROM orders WHERE o_orderkey % 100 < 4 GROUP BY 1, 2)
      SELECT sim_id, t, round(dt, 6) AS dt,
        round(sum(dt) OVER (PARTITION BY sim_id ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS elapsed
      FROM g ORDER BY sim_id, t"""))

  val qs: Seq[Q] = Seq(q40, q41, q42, q43)
}
