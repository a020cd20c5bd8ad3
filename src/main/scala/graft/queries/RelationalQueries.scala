package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.core.Tables
import QUtil.dsum

/** Relational operator surface of the engine mapped onto the driver test
  * tables. Each query exercises one (or a few) operators from SURVEY.md §2:
  * hash aggregation, pushed filters/projections, broadcast/anti joins, the
  * F-order gather join, windowed sequencing, clamps, validation, unions.
  *
  * Money-typed SUMs route through DECIMAL(18,6) so Spark and the DuckDB
  * oracle cannot diverge by summation order (per-term double→decimal
  * rounding is deterministic and identical; decimal addition is exact).
  */
object RelationalQueries {

  // ---------------------------------------------------------------- q01
  // OP-A1/A3/A4 + Catalyst partial aggregation: TPC-H-Q1-shaped pricing
  // summary. Ref analog: per-(sim) state counts and QA stats
  // (/root/reference/src/pumle/sim_results_parser.py:42-50).
  private val q01 = Q(
    "q01_pricing_summary",
    (s, d) => {
      // (probed round 14: repartitioning the one-row-group scan to
      // parallelize the 600k-row partial aggregate measured SLOWER —
      // 1.03 → 1.25 s — the numeric agg is too cheap per row to pay a
      // shuffle for, unlike the string/hash expression passes)
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          avg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      sum(l_quantity) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
      CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
      avg(l_quantity) AS avg_qty,
      count(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  // ---------------------------------------------------------------- q02
  // OP-F2/F4/F6: predicate + projection, fully pushed to the parquet scan
  // (PushedFilters in explain). Ref: bounds filter + field projection
  // (sim_results_parser.py:295-304, :226-258).
  private val q02 = Q(
    "q02_filter_project",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_quantity") < 25 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem WHERE l_quantity < 25 AND l_returnflag = 'R'
      ORDER BY l_orderkey, l_linenumber"""))

  // ---------------------------------------------------------------- q03
  // OP-J1: broadcast hash-join enrichment through two small dims.
  // Ref: params-by-hash catalog lookup (src/pumle/arrays.py:243-253).
  private val q03 = Q(
    "q03_join_enrich",
    (s, d) => {
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy(col("r_name"))
    },
    Some("""SELECT r_name, count(*) AS n_customers,
      CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_acctbal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""))

  // ---------------------------------------------------------------- q04
  // OP-J2: left-anti join — the engine's idempotent-upsert / dedup
  // primitive (INSERT OR IGNORE, /root/reference/src/pumle/db.py:25-28).
  private val q04 = Q(
    "q04_anti_join",
    (s, d) => {
      Tables.customer(s, d)
        .join(
          Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q05
  // OP-J3 + OP-X7: F-order linearization (idx = i + I*(j + J*k), the
  // MATLAB sub2ind convention, /root/reference/src/pumle/arrays.py:138)
  // followed by the active-cell gather join against a broadcast index set.
  private val q05 = Q(
    "q05_gather_join",
    (s, d) => {
      val cells = Tables.lineitem(s, d).select(
        ((col("l_orderkey") % 9) +
          lit(9) * ((col("l_partkey") % 8) + lit(8) * (col("l_suppkey") % 5))).as("cell_idx"))
      val active = Tables.part(s, d)
        .filter(col("p_partkey") % 7 =!= 0)
        .select((col("p_partkey") % 360).as("cell_idx"))
        .distinct()
      cells.join(broadcast(active), Seq("cell_idx"))
        .groupBy(col("cell_idx")).agg(count(lit(1)).as("n_states"))
        .orderBy(col("cell_idx"))
    },
    Some("""WITH cells AS (
        SELECT (l_orderkey % 9) + 9 * ((l_partkey % 8) + 8 * (l_suppkey % 5)) AS cell_idx
        FROM lineitem),
      active AS (
        SELECT DISTINCT p_partkey % 360 AS cell_idx FROM part WHERE p_partkey % 7 <> 0)
      SELECT c.cell_idx, count(*) AS n_states
      FROM cells c JOIN active a USING (cell_idx)
      GROUP BY c.cell_idx ORDER BY c.cell_idx"""))

  // ---------------------------------------------------------------- q06
  // OP-W1/W2: deterministic sequencing via row_number (timestep / sim_id
  // assignment, /root/reference/src/pumle/parameters_variation.py:184-192).
  private val q06 = Q(
    "q06_window_rownum",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast(LongType))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("order_date"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, rn
      FROM (SELECT o_custkey, o_orderkey, o_orderdate,
              row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS rn
            FROM orders)
      WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  // ---------------------------------------------------------------- q12
  // OP-A6 + OP-F7 + OP-X12: conditional positive-min then floor/clamp —
  // the porosity floor (co2lab3DPUMLE.m:132-135) and physical-limits clamp
  // (parameters.py:99-115) as least/greatest column exprs.
  private val q12 = Q(
    "q12_conditional_clamp",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val minpos = li.agg(
        min(when(col("l_discount") > 0, col("l_discount"))).as("minpos"))
      li.crossJoin(broadcast(minpos))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          when(col("l_discount") < col("minpos"), lit(1e-3))
            .otherwise(col("l_discount")).as("floored_discount"),
          greatest(least(col("l_extendedprice"), lit(5e4)), lit(1e3)).as("clamped_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""WITH mp AS (
        SELECT min(CASE WHEN l_discount > 0 THEN l_discount END) AS minpos FROM lineitem)
      SELECT l_orderkey, l_linenumber,
        CASE WHEN l_discount < mp.minpos THEN 1e-3 ELSE l_discount END AS floored_discount,
        greatest(least(l_extendedprice, 5e4), 1e3) AS clamped_price
      FROM lineitem, mp
      ORDER BY l_orderkey, l_linenumber"""))

  // ---------------------------------------------------------------- q13
  // OP-V1: declarative validation pass — per-check violation counts (the
  // pandera schema, /root/reference/src/pumle/metadata.py:30-59).
  private val q13 = Q(
    "q13_validation_counts",
    (s, d) => {
      Tables.lineitem(s, d).agg(
        count(when(!(col("l_quantity") > 0), lit(1))).as("bad_quantity"),
        count(when(col("l_discount") < 0 || col("l_discount") > 1, lit(1))).as("bad_discount"),
        count(when(col("l_tax") < 0, lit(1))).as("bad_tax"),
        count(when(!col("l_returnflag").isin("A", "N", "R"), lit(1))).as("bad_returnflag"),
        count(when(col("l_orderkey").isNull, lit(1))).as("null_orderkey"),
        count(lit(1)).as("n_rows"))
    },
    Some("""SELECT
        count(CASE WHEN NOT (l_quantity > 0) THEN 1 END) AS bad_quantity,
        count(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END) AS bad_discount,
        count(CASE WHEN l_tax < 0 THEN 1 END) AS bad_tax,
        count(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 END) AS bad_returnflag,
        count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS null_orderkey,
        count(*) AS n_rows
      FROM lineitem"""))

  // ---------------------------------------------------------------- q16
  // OP-U1 + OP-O2: union of per-slice frames then global sort (the
  // pd.concat loop, /root/reference/src/pumle/tabular.py:131-135).
  private val q16 = Q(
    "q16_union_sorted",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val hi = li.filter(col("l_quantity") >= 45)
        .select(lit("high").as("bucket"), col("l_orderkey"), col("l_linenumber"))
      val lo = li.filter(col("l_quantity") <= 5)
        .select(lit("low").as("bucket"), col("l_orderkey"), col("l_linenumber"))
      hi.unionAll(lo).orderBy(col("bucket"), col("l_orderkey"), col("l_linenumber"))
    },
    Some("""SELECT 'high' AS bucket, l_orderkey, l_linenumber FROM lineitem WHERE l_quantity >= 45
      UNION ALL
      SELECT 'low' AS bucket, l_orderkey, l_linenumber FROM lineitem WHERE l_quantity <= 5
      ORDER BY bucket, l_orderkey, l_linenumber"""))

  // ---------------------------------------------------------------- q17
  // Catalog status machine analog (OP-S8/OP-V6): latest state per key.
  // ts is nanosecond-precision in parquet; Spark reads it as raw nanos
  // (nanosAsLong) so both sides order at full ns precision.
  private val q17 = Q(
    "q17_latest_event",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("value"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
          row_number() OVER (PARTITION BY user_id
                             ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn = 1 ORDER BY user_id"""))

  // ---------------------------------------------------------------- q31
  // Top-k by exact decimal revenue (scale path: partial agg then a single
  // k-row ordered take — no full sort of the aggregate at scale).
  private val q31 = Q(
    "q31_topk_revenue",
    (s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy(col("revenue").desc, col("o_custkey"))
        .limit(10)
    },
    Some("""SELECT o_custkey,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        count(*) AS n_orders
      FROM orders GROUP BY o_custkey
      ORDER BY revenue DESC, o_custkey LIMIT 10"""))

  // ---------------------------------------------------------------- q33
  // OP-A4/OP-A5: QA field stats (describeGolden) — min/max/counts per
  // group (the notebook's nanmin/nanmax/NaN-count acceptance checks).
  private val q33 = Q(
    "q33_field_stats",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("grp"))
        .agg(
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          count(lit(1)).as("n"),
          count(when(col("l_discount") === 0, lit(1))).as("n_zero_disc"))
        .orderBy(col("grp"))
    },
    Some("""SELECT l_returnflag AS grp,
        min(l_extendedprice) AS min_price,
        max(l_extendedprice) AS max_price,
        count(*) AS n,
        count(CASE WHEN l_discount = 0 THEN 1 END) AS n_zero_disc
      FROM lineitem GROUP BY l_returnflag ORDER BY grp"""))

  // ---------------------------------------------------------------- q18
  // Sessionization: gap > 30 min starts a new session (lag + running
  // sum — the batch form of a session window). Spark reads the parquet
  // TIMESTAMP(NANOS) as raw nanos; DuckDB truncates to µs on read — so
  // both sides compute on MICROSECONDS (ts DIV 1000 / epoch_us).
  private val q18 = Q(
    "q18_sessionize",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val run = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("ts_us", expr("ts DIV 1000"))
        .withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(w))
        .withColumn("new_sess",
          when(col("gap").isNull || col("gap") > 1800000000L, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_sess")).over(run))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
        .orderBy(col("user_id"), col("session_id"))
    },
    Some("""WITH g AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
          epoch_us(ts) - lag(epoch_us(ts)) OVER
            (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
        FROM events),
      sess AS (
        SELECT user_id, event_id, ts_us,
          CAST(sum(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM g)
      SELECT user_id, session_id, count(*) AS n_events,
        min(ts_us) AS start_us, max(ts_us) AS end_us
      FROM sess GROUP BY user_id, session_id
      ORDER BY user_id, session_id"""))

  // ---------------------------------------------------------------- q19
  // Semi-structured props extraction (the engine's JSON-column path;
  // regexp-based so both engines share the exact extraction).
  private val q19 = Q(
    "q19_json_props",
    (s, d) => {
      Tables.events(s, d)
        .select(col("event_type"),
          regexp_extract(col("props"), "([0-9]+)", 1).cast(LongType).as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), avg(col("k")).as("avg_k"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type,
        CAST(sum(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        avg(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS avg_k,
        count(*) AS n
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // ---------------------------------------------------------------- q30
  // Skew-salted join: 90% of fact rows hit one dim key; salting
  // replicates the dim ×16 and splits the hot key across 16 shuffle
  // partitions. Results are identical to the plain join (the oracle is
  // the UNSALTED formulation — correctness of the rewrite is the test).
  private val q30 = Q(
    "q30_salted_join",
    (s, d) => {
      import s.implicits._
      val nSalt = 16
      val dim = Tables.region(s, d)
        .select(col("r_regionkey").as("key"), col("r_name").as("dim_name"))
      val saltedDim = dim.crossJoin(
        s.range(nSalt).select(col("id").cast("int").as("salt")))
      val fact = Tables.lineitem(s, d)
        .select(
          when(col("l_orderkey") % 10 < 9, 0L)
            .otherwise(col("l_orderkey") % 5).as("key"),
          (col("l_orderkey") % nSalt).cast("int").as("salt"),
          col("l_extendedprice"))
      fact.join(saltedDim, Seq("key", "salt"))
        .groupBy(col("key"), col("dim_name"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("key"))
    },
    Some("""SELECT CASE WHEN l_orderkey % 10 < 9 THEN 0 ELSE l_orderkey % 5 END AS key,
        r_name AS dim_name, count(*) AS n,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
      FROM lineitem
      JOIN region ON r_regionkey =
        CASE WHEN l_orderkey % 10 < 9 THEN 0 ELSE l_orderkey % 5 END
      GROUP BY 1, 2 ORDER BY key"""))

  // ---------------------------------------------------------------- q34
  // Sliding-frame window aggregate: per-user rolling 3-event mean of
  // `value` (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), ordered by
  // (ts, event_id) — the rolling-metric shape (moving averages, rate
  // smoothing) that complements q17's top-1 and q18's running-sum
  // windows. One hash shuffle on user_id, then a narrow in-partition
  // frame scan. Frame sums route through DECIMAL(18,6) (the dsum
  // discipline) so intra-frame addition order cannot produce ULP
  // divergence cross-engine.
  private val q34 = Q(
    "q34_rolling_avg",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, 0)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("n_in_frame", count(lit(1)).over(w))
        .withColumn("rolling_avg",
          round(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
            .over(w).cast("double") / col("n_in_frame").cast("double"), 6))
        .drop("ts")
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""SELECT user_id, event_id, value,
        count(*) OVER w AS n_in_frame,
        round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
          / count(*) OVER w, 6) AS rolling_avg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, event_id"""))

  // ---------------------------------------------------------------- q35
  // Event debounce: keep only the FIRST event of each ≥60s-gap burst per
  // (user, event_type) — the stream-hygiene dedup that collapses retry
  // storms / double-clicks before rate analysis. True debounce is
  // session-anchored (an event chain 10s apart for 5 minutes is ONE
  // burst), so the keep test is "gap to previous > horizon", i.e. the
  // q18 sessionize boundary rows — one lag window, one key shuffle, and
  // the boundary filter needs no second window. µs arithmetic on both
  // engines (the q18 contract).
  private val q35 = Q(
    "q35_debounce",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, d)
        .withColumn("ts_us", expr("ts DIV 1000"))
        .withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(w))
        .filter(col("gap").isNull || col("gap") > 60L * 1000000L)
        .select(col("user_id"), col("event_type"), col("event_id"), col("ts_us"))
        .orderBy(col("user_id"), col("event_type"), col("event_id"))
    },
    Some("""WITH e AS (
        SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
          epoch_us(ts) - lag(epoch_us(ts)) OVER
            (PARTITION BY user_id, event_type
             ORDER BY epoch_us(ts), event_id) AS gap
        FROM events)
      SELECT user_id, event_type, event_id, ts_us FROM e
      WHERE gap IS NULL OR gap > 60000000
      ORDER BY user_id, event_type, event_id"""))

  val qs: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q12, q13, q16, q17,
    q18, q19, q30, q31, q33, q34, q35)
}
