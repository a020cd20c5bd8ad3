package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import QUtil._

/** Parameter-sweep / hashing / voxel-array operators (SURVEY.md §2.6)
  * mapped onto the driver test tables.
  *
  * These are the relational re-expressions of PUMLE's sweep generator
  * (/root/reference/src/pumle/parameters_variation.py), param hashing
  * (/root/reference/src/pumle/utils.py:52-81) and the F-order voxel
  * scatter/gather (/root/reference/src/pumle/arrays.py:88-143).
  * All scale as narrow transforms + broadcast joins: no shuffle except
  * where an aggregation/window is the semantic point.
  */
object SweepQueries {

  // ---------------------------------------------------------------- q20
  // OP-X1 + OP-O1: canonical sorted-key param serialization → md5 →
  // 8-hex-char sim_hash (utils.py:52-81). Numbers are embedded via
  // printf %.6e on BOTH sides so the serialized bytes are identical.
  private val q20 = Q(
    "q20_param_hash",
    (s, d) => {
      val canon = concat(
        lit("{\"cp_rock\": "), printf6e(col("s_acctbal") / 1e7),
        lit(", \"pe\": "), printf6e((col("s_suppkey") % 10) + 0.5),
        lit(", \"pres_ref\": "), printf6e((col("s_nationkey") + 1) * 4.0),
        lit("}"))
      Tables.supplier(s, d)
        .select(
          col("s_suppkey"),
          canon.as("canonical_json"),
          substring(md5(canon), 1, 8).as("sim_hash"))
        .orderBy(col("s_suppkey"))
    },
    Some("""SELECT s_suppkey,
        '{"cp_rock": ' || printf('%.6e', s_acctbal / 1e7) ||
        ', "pe": ' || printf('%.6e', (s_suppkey % 10) + 0.5) ||
        ', "pres_ref": ' || printf('%.6e', (s_nationkey + 1) * 4.0) ||
        '}' AS canonical_json,
        substr(md5('{"cp_rock": ' || printf('%.6e', s_acctbal / 1e7) ||
        ', "pe": ' || printf('%.6e', (s_suppkey % 10) + 0.5) ||
        ', "pres_ref": ' || printf('%.6e', (s_nationkey + 1) * 4.0) ||
        '}'), 1, 8) AS sim_hash
      FROM supplier ORDER BY s_suppkey"""))

  // ---------------------------------------------------------------- q21
  // OP-X10 + OP-X12: per-parameter linspace with the reference's points
  // rule points = max(min(⌊1/δ⌋,100),2) (parameters_variation.py:78-84)
  // and variation bounds base·(1∓δ). Narrow: explode(sequence(...)),
  // no shuffle at any scale.
  private val q21 = Q(
    "q21_linspace_sweep",
    (s, d) => {
      val base = (col("n_nationkey") + 1).cast("double")
      val delta = ((col("n_nationkey") % 5) + 1).cast("double") / 10.0
      Tables.nation(s, d)
        .select(
          col("n_nationkey").as("param_id"), base.as("base"), delta.as("delta"),
          greatest(least(floor(lit(1.0) / delta), lit(100.0)), lit(2.0))
            .cast("long").as("points"))
        .withColumn("idx", explode(sequence(lit(0L), col("points") - 1)))
        .select(
          col("param_id"), col("idx"),
          (col("base") * (lit(1.0) - col("delta")) +
            col("idx").cast("double") *
              (col("base") * (lit(1.0) + col("delta")) - col("base") * (lit(1.0) - col("delta"))) /
              (col("points") - 1).cast("double")).as("value"))
        .orderBy(col("param_id"), col("idx"))
    },
    Some("""WITH p AS (
        SELECT n_nationkey AS param_id,
               CAST(n_nationkey + 1 AS DOUBLE) AS base,
               CAST((n_nationkey % 5) + 1 AS DOUBLE) / 10.0 AS delta,
               CAST(greatest(least(floor(1.0 / (CAST((n_nationkey % 5) + 1 AS DOUBLE) / 10.0)), 100.0), 2.0) AS BIGINT) AS points
        FROM nation)
      SELECT param_id, CAST(g.generate_series AS BIGINT) AS idx,
        base * (1.0 - delta) + CAST(g.generate_series AS DOUBLE) *
          (base * (1.0 + delta) - base * (1.0 - delta)) / CAST(points - 1 AS DOUBLE) AS value
      FROM p, generate_series(0, 99) g
      WHERE g.generate_series <= points - 1
      ORDER BY param_id, idx"""))

  // ---------------------------------------------------------------- q22
  // OP-X11 + OP-W2 + OP-X1: meshgrid cross-product of three parameter
  // ranges, deterministic sim_id via row_number over the canonical
  // enumeration order (last param slowest — parameters_variation.py:184-192),
  // and the per-combo hash. Cross-joins of tiny broadcast ranges: no
  // shuffle; the window is over the (small) combo count only.
  private val q22 = Q(
    "q22_meshgrid_sweep",
    (s, d) => {
      val r = Tables.region(s, d)
      val pa = r.select((col("r_regionkey") * 2.0 + 1.0).as("pres_ref"))
      val pb = r.filter(col("r_regionkey") < 3).select((col("r_regionkey") / 10.0 + 0.05).as("srw"))
      val pc = r.filter(col("r_regionkey") < 2).select((col("r_regionkey") + 1.0).as("pe"))
      val combos = pa.crossJoin(pb).crossJoin(pc)
      val w = Window.orderBy(col("pe"), col("srw"), col("pres_ref"))
      combos
        .withColumn("sim_id", row_number().over(w).cast("long"))
        .withColumn("sim_hash",
          substring(md5(concat(
            lit("{\"pe\": "), printf6e(col("pe")),
            lit(", \"pres_ref\": "), printf6e(col("pres_ref")),
            lit(", \"srw\": "), printf6e(col("srw")),
            lit("}"))), 1, 8))
        .orderBy(col("sim_id"))
    },
    Some("""WITH pa AS (SELECT r_regionkey * 2.0 + 1.0 AS pres_ref FROM region),
        pb AS (SELECT r_regionkey / 10.0 + 0.05 AS srw FROM region WHERE r_regionkey < 3),
        pc AS (SELECT r_regionkey + 1.0 AS pe FROM region WHERE r_regionkey < 2),
        combos AS (SELECT pres_ref, srw, pe FROM pa, pb, pc)
      SELECT pres_ref, srw, pe,
        CAST(row_number() OVER (ORDER BY pe, srw, pres_ref) AS BIGINT) AS sim_id,
        substr(md5('{"pe": ' || printf('%.6e', pe) ||
                   ', "pres_ref": ' || printf('%.6e', pres_ref) ||
                   ', "srw": ' || printf('%.6e', srw) || '}'), 1, 8) AS sim_hash
      FROM combos ORDER BY sim_id"""))

  // ---------------------------------------------------------------- q23
  // OP-X7: F-order linearize/delinearize round-trip on an 81×58×20
  // UNISIM-shaped grid (idx = i + I*(j + J*k), 0-based, MATLAB sub2ind —
  // arrays.py:138-140). Pure narrow arithmetic; proves bijectivity on
  // every derived cell.
  private val q23 = Q(
    "q23_forder_roundtrip",
    (s, d) => {
      val I = 81; val J = 58
      val src = Tables.lineitem(s, d).select(
        (col("l_orderkey") % 81).cast("long").as("i"),
        (col("l_partkey") % 58).cast("long").as("j"),
        (col("l_suppkey") % 20).cast("long").as("k")).distinct()
      src
        .withColumn("idx", col("i") + lit(I) * (col("j") + lit(J) * col("k")))
        .select(
          col("idx"),
          (col("idx") % I).as("i"),
          ((col("idx") / I).cast("long") % J).as("j"),
          (col("idx") / (I * J)).cast("long").as("k"))
        .orderBy(col("idx"))
    },
    Some("""WITH src AS (
        SELECT DISTINCT CAST(l_orderkey % 81 AS BIGINT) AS i,
               CAST(l_partkey % 58 AS BIGINT) AS j,
               CAST(l_suppkey % 20 AS BIGINT) AS k
        FROM lineitem),
      lin AS (SELECT i + 81 * (j + 58 * k) AS idx FROM src)
      SELECT idx, idx % 81 AS i, (idx // 81) % 58 AS j, idx // (81*58) AS k
      FROM lin ORDER BY idx"""))

  // ---------------------------------------------------------------- q24
  // OP-X8: scatter-by-index densify — materialize the full (cell ×
  // timestep) grid and left-join sparse active values; missing cells
  // stay NULL (the long-form stand-in for the npy NaN fill,
  // arrays.py:88-92). Grid side is generated (no scan); active side
  // broadcasts at this cardinality, and at 100 TB the same plan works
  // with the join keys co-partitioned instead.
  private val q24 = Q(
    "q24_scatter_densify",
    (s, d) => {
      val cells = s.range(0, 300).select(col("id").as("cell_idx"))
      val steps = s.range(0, 4).select(col("id").as("t"))
      val grid = cells.crossJoin(steps)
      val active = Tables.part(s, d)
        .filter(col("p_partkey") % 3 === 0)
        .select(
          (col("p_partkey") % 300).as("cell_idx"),
          (col("p_partkey") % 4).as("t"),
          (col("p_retailprice") / 100.0).as("value"))
        .groupBy(col("cell_idx"), col("t"))
        .agg(dsum(col("value")).as("value"))
      grid.join(broadcast(active), Seq("cell_idx", "t"), "left")
        .orderBy(col("cell_idx"), col("t"))
    },
    Some("""WITH cells AS (SELECT CAST(generate_series AS BIGINT) AS cell_idx FROM generate_series(0, 299)),
        steps AS (SELECT CAST(generate_series AS BIGINT) AS t FROM generate_series(0, 3)),
        grid AS (SELECT cell_idx, t FROM cells, steps),
        active AS (
          SELECT p_partkey % 300 AS cell_idx, p_partkey % 4 AS t,
                 CAST(sum(CAST(p_retailprice / 100.0 AS DECIMAL(18,6))) AS DOUBLE) AS value
          FROM part WHERE p_partkey % 3 = 0 GROUP BY 1, 2)
      SELECT g.cell_idx, g.t, a.value
      FROM grid g LEFT JOIN active a USING (cell_idx, t)
      ORDER BY g.cell_idx, g.t"""))

  // ---------------------------------------------------------------- q25
  // OP-X9 + OP-F5: nonzero COO sparsification — delinearize idx→(x,y,z)
  // and keep nonzero values only (tabular.py:117-129). The engine's
  // tabular-export path as one narrow select+filter.
  private val q25 = Q(
    "q25_sparsify_coo",
    (s, d) => {
      val I = 9; val J = 8
      Tables.lineitem(s, d)
        .select(
          (col("l_orderkey") % 360).cast("long").as("idx"),
          when(col("l_linenumber") % 3 === 0, lit(0.0))
            .otherwise(col("l_quantity")).as("value"))
        .groupBy(col("idx")).agg(dsum(col("value")).as("values"))
        .filter(col("values") =!= 0.0)
        .select(
          (col("idx") % I).as("x"),
          ((col("idx") / I).cast("long") % J).as("y"),
          (col("idx") / (I * J)).cast("long").as("z"),
          col("values"))
        .orderBy(col("x"), col("y"), col("z"))
    },
    Some("""WITH g AS (
        SELECT CAST(l_orderkey % 360 AS BIGINT) AS idx,
          CAST(sum(CAST(CASE WHEN l_linenumber % 3 = 0 THEN 0.0 ELSE l_quantity END
                        AS DECIMAL(18,6))) AS DOUBLE) AS values
        FROM lineitem GROUP BY 1)
      SELECT idx % 9 AS x, (idx // 9) % 8 AS y, idx // 72 AS z, values
      FROM g WHERE values <> 0.0
      ORDER BY x, y, z"""))

  // ---------------------------------------------------------------- q26
  // OP-X2: params→filename encoding (utils.py:200-242): sorted key_value
  // parts, floats as %.2e with .→p, +→'', -→m.
  private val q26 = Q(
    "q26_filename_encode",
    (s, d) => {
      Tables.supplier(s, d)
        .select(
          col("s_suppkey"),
          concat(
            lit("cp_rock_"), sciEncode(col("s_acctbal") / 1e9),
            lit("_pe_"), sciEncode((col("s_suppkey") % 10) + 0.5),
            lit("_xnacl_"), sciEncode((col("s_nationkey") + 1) / 250.0)
          ).as("filename"))
        .orderBy(col("s_suppkey"))
    },
    Some("""SELECT s_suppkey,
        'cp_rock_' || replace(replace(replace(printf('%.2e', s_acctbal / 1e9),'.','p'),'+',''),'-','m') ||
        '_pe_'     || replace(replace(replace(printf('%.2e', (s_suppkey % 10) + 0.5),'.','p'),'+',''),'-','m') ||
        '_xnacl_'  || replace(replace(replace(printf('%.2e', (s_nationkey + 1) / 250.0),'.','p'),'+',''),'-','m')
        AS filename
      FROM supplier ORDER BY s_suppkey"""))

  // ---------------------------------------------------------------- q27
  // OP-X12 + OP-V5: physical-limits clamp of variation ranges against a
  // broadcast limits table (parameters.py:86-115): lo = max(phys_min,
  // base·(1-δ)), hi = min(phys_max, base·(1+δ)), plus the violation flag.
  private val q27 = Q(
    "q27_physical_limits",
    (s, d) => {
      import s.implicits._
      val limits = Seq(
        ("pres_ref", 1.0, 100.0), ("temp_ref", 0.0, 200.0),
        ("cp_rock", 1e-6, 1e-3), ("srw", 0.0, 0.3),
        ("src", 0.0, 0.3), ("pe", 0.1, 10.0),
        ("xnacl", 0.0, 0.2), ("rho_h2o", 900.0, 1200.0))
        .toDF("param", "phys_min", "phys_max")
      val names = typedLit(Seq("pres_ref", "temp_ref", "cp_rock", "srw", "src", "pe", "xnacl", "rho_h2o"))
      val base = Tables.customer(s, d)
        .select(
          col("c_custkey"),
          element_at(names, (col("c_custkey") % 8 + 1).cast("int")).as("param"),
          (col("c_acctbal").cast("double") / 100.0).as("base"),
          lit(0.2).as("delta"))
      base.join(broadcast(limits), Seq("param"))
        .select(
          col("c_custkey"), col("param"), col("base"),
          greatest(col("phys_min"), col("base") * 0.8).as("lo"),
          least(col("phys_max"), col("base") * 1.2).as("hi"),
          (col("base") < col("phys_min") || col("base") > col("phys_max")).as("out_of_limits"))
        .orderBy(col("c_custkey"))
    },
    Some("""WITH limits(param, phys_min, phys_max) AS (VALUES
        ('pres_ref', 1.0, 100.0), ('temp_ref', 0.0, 200.0),
        ('cp_rock', 1e-6, 1e-3), ('srw', 0.0, 0.3),
        ('src', 0.0, 0.3), ('pe', 0.1, 10.0),
        ('xnacl', 0.0, 0.2), ('rho_h2o', 900.0, 1200.0)),
      names(i, param) AS (VALUES
        (1,'pres_ref'),(2,'temp_ref'),(3,'cp_rock'),(4,'srw'),
        (5,'src'),(6,'pe'),(7,'xnacl'),(8,'rho_h2o')),
      base AS (
        SELECT c_custkey, n.param, CAST(c_acctbal AS DOUBLE) / 100.0 AS base
        FROM customer c JOIN names n ON n.i = c.c_custkey % 8 + 1)
      SELECT c_custkey, b.param, base,
        greatest(phys_min, base * 0.8) AS lo,
        least(phys_max, base * 1.2) AS hi,
        (base < phys_min OR base > phys_max) AS out_of_limits
      FROM base b JOIN limits l ON b.param = l.param
      ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q28
  // OP-F1 + OP-F3 + OP-J3: ACTNUM mask → active index set → gather join
  // pulling state values at active positions only
  // (sim_results_parser.py:197-224, :303-304).
  private val q28 = Q(
    "q28_active_gather",
    (s, d) => {
      val actnum = Tables.part(s, d)
        .select(
          (col("p_partkey") % 500).as("cell_idx"),
          (col("p_size") % 4 =!= 0).as("active"))
        .groupBy(col("cell_idx"))
        .agg(max(col("active")).as("active"))
      val activeIdx = actnum.filter(col("active")).select(col("cell_idx"))
      val states = Tables.lineitem(s, d)
        .select(
          (col("l_orderkey") % 500).as("cell_idx"),
          (col("l_linenumber") % 3).cast("long").as("t"),
          col("l_extendedprice").as("pressure"))
      states.join(broadcast(activeIdx), Seq("cell_idx"))
        .groupBy(col("cell_idx"), col("t"))
        .agg(dsum(col("pressure")).as("sum_pressure"), count(lit(1)).as("n"))
        .orderBy(col("cell_idx"), col("t"))
    },
    Some("""WITH actnum AS (
        SELECT p_partkey % 500 AS cell_idx, max(p_size % 4 <> 0) AS active
        FROM part GROUP BY 1),
      active_idx AS (SELECT cell_idx FROM actnum WHERE active),
      states AS (
        SELECT l_orderkey % 500 AS cell_idx,
               CAST(l_linenumber % 3 AS BIGINT) AS t,
               l_extendedprice AS pressure
        FROM lineitem)
      SELECT s.cell_idx, s.t,
        CAST(sum(CAST(pressure AS DECIMAL(18,6))) AS DOUBLE) AS sum_pressure,
        count(*) AS n
      FROM states s JOIN active_idx a USING (cell_idx)
      GROUP BY s.cell_idx, s.t
      ORDER BY s.cell_idx, s.t"""))

  // ---------------------------------------------------------------- q29
  // OP-J2 + OP-S8: idempotent catalog upsert — existing ∪ (new ⟕̸ existing)
  // (INSERT OR IGNORE, db.py:25-28,106-131) with status transitions.
  private val q29 = Q(
    "q29_catalog_upsert",
    (s, d) => {
      val existing = Tables.orders(s, d)
        .filter(col("o_orderkey") % 7 === 0)
        .select(
          substring(md5(col("o_orderkey").cast("string")), 1, 8).as("sim_hash"),
          col("o_orderkey").as("sim_id"), lit("COMPLETED").as("status"))
      val incoming = Tables.orders(s, d)
        .filter(col("o_orderkey") % 5 === 0)
        .select(
          substring(md5(col("o_orderkey").cast("string")), 1, 8).as("sim_hash"),
          col("o_orderkey").as("sim_id"), lit("CREATED").as("status"))
      existing
        .unionAll(incoming.join(existing.select("sim_hash"), Seq("sim_hash"), "left_anti"))
        .orderBy(col("sim_id"), col("sim_hash"))
    },
    Some("""WITH existing AS (
        SELECT substr(md5(CAST(o_orderkey AS VARCHAR)),1,8) AS sim_hash,
               o_orderkey AS sim_id, 'COMPLETED' AS status
        FROM orders WHERE o_orderkey % 7 = 0),
      incoming AS (
        SELECT substr(md5(CAST(o_orderkey AS VARCHAR)),1,8) AS sim_hash,
               o_orderkey AS sim_id, 'CREATED' AS status
        FROM orders WHERE o_orderkey % 5 = 0)
      SELECT * FROM existing
      UNION ALL
      SELECT i.* FROM incoming i
      WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.sim_hash = i.sim_hash)
      ORDER BY sim_id, sim_hash"""))

  val qs: Seq[Q] = Seq(q20, q21, q22, q23, q24, q25, q26, q27, q28, q29)
}
