package graft.pumle

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The bronze → silver → golden → tabular spine (SURVEY.md §3.2, §7.2).
  *
  * Reference flow (/root/reference/src/pumle/sim_results_parser.py +
  * arrays.py + tabular.py): per-sim JSON states → gather active cells →
  * dense F-order 4D arrays → nonzero long-format CSV. Here the golden
  * shape is the LONG FORM `(sim_hash, field, t, i, j, k, value)` —
  * partitioned by sim_hash it gives Catalyst real partition pruning, and
  * dense tensors exist only at export sinks (graft.pumle.export).
  *
  * Scale design: one narrow job per sim batch — posexplode over
  * timesteps and cells is pipelined inside whole-stage codegen; the only
  * wide operations are the broadcast gather-join against the (≤ grid
  * size) active-index set and the final write partitioning. No
  * driver-side loops: a thousand sims = a thousand input files in one
  * `spark.read.json`.
  */
object Pipeline {

  /** Bronze states file schema (sim_results_parser.py:284-304;
    * co2lab3DPUMLE.m:517-559): array of per-timestep records. */
  val statesSchema: StructType = StructType(Seq(
    StructField("states", ArrayType(StructType(Seq(
      StructField("pressure", ArrayType(DoubleType)),
      StructField("s", ArrayType(ArrayType(DoubleType)))))))))

  /** Read one-or-many bronze states JSONs written as
    * `{"states":[...]}` or a bare top-level array (the solver emits
    * `jsonencode(states)` — a bare array; fixtures use the wrapped
    * form). `sim_hash` is derived from the file name
    * `states_<case>_<hash>.json` (sim_results_parser.py:69-74). */
  def readBronzeStates(spark: SparkSession, path: String): DataFrame = {
    spark.read.schema(statesSchema)
      .option("multiLine", true).json(path)
      .withColumn("sim_hash",
        regexp_extract(input_file_name(), "states_[^_]+_([0-9a-f]+)\\.json", 1))
  }

  /** ACTNUM mask JSON (`grdecl_<case>_<hash>.json`, a 0/1 array in
    * F-order over all I·J·K cells — sim_results_parser.py:207-214) →
    * (cell_idx, active). */
  def readActnum(spark: SparkSession, path: String): DataFrame = {
    spark.read.schema(StructType(Seq(
        StructField("actnum", ArrayType(IntegerType)))))
      .option("multiLine", true).json(path)
      .select(posexplode(col("actnum")).as(Seq("cell_idx", "flag")))
      .select(col("cell_idx"), (col("flag") === 1).as("active"))
  }

  /** Grid dims JSON (`g_<case>.json` = [I,J,K] —
    * sim_results_parser.py:180-190). Driver-side scalar read. */
  def readDims(spark: SparkSession, path: String): (Int, Int, Int) = {
    val arr = spark.read.schema(StructType(Seq(
        StructField("dims", ArrayType(IntegerType)))))
      .option("multiLine", true).json(path)
      .select(col("dims")).head().getSeq[Int](0)
    require(arr.length == 3 && arr.forall(_ > 0), s"bad dims: $arr") // OP-V2
    (arr(0), arr(1), arr(2))
  }

  /** OP-V2 fail-fast: every sim must have a non-empty states array
    * (sim_results_parser.py:33-40, :277-278). */
  def requireNonEmptyStates(states: DataFrame): Unit = {
    val bad = states
      .filter(col("states").isNull || size(col("states")) === 0)
      .select(col("sim_hash")).limit(5).collect().map(_.getString(0))
    require(bad.isEmpty, s"empty states for sims: ${bad.mkString(",")}")
  }

  /** OP-A5 drop diagnostics: per sim, how many ACTIVE cells were NOT
    * gathered because the state arrays were shorter than the grid (the
    * reference's warn-and-drop path, sim_results_parser.py:295-300 /
    * arrays.py:106-110). */
  def gatherDropStats(states: DataFrame, actnum: DataFrame): DataFrame = {
    val nActive = actnum.filter(col("active")).count()
    states
      .select(col("sim_hash"), posexplode(col("states")).as(Seq("t", "state")))
      .select(col("sim_hash"), col("t"), size(col("state.pressure")).as("n_state"))
      .groupBy(col("sim_hash"))
      .agg(count(lit(1)).as("n_timesteps"), min(col("n_state")).as("min_state_len"))
      .select(col("sim_hash"), col("n_timesteps"),
        lit(nActive).as("n_active"),
        greatest(lit(0L),
          lit(nActive) - col("min_state_len").cast("long")).as("max_dropped_per_t"))
  }

  /** Silver: per-(sim, t, cell) rows gathered to ACTIVE cells only
    * (OP-F1/F3/J3). Validation (OP-V2/V3): empty states fail; index
    * bounds are enforced by the `cell_idx < size(pressure)` filter with
    * the dropped count observable as metric `silver_dropped`
    * (OP-A5 / OP-F2). */
  def silver(states: DataFrame, actnum: DataFrame): DataFrame = {
    val activeIdx = actnum.filter(col("active")).select(col("cell_idx"))
    states
      .select(col("sim_hash"), posexplode(col("states")).as(Seq("t", "state")))
      .select(col("sim_hash"), col("t"),
        posexplode(arrays_zip(col("state.pressure"), col("state.s")))
          .as(Seq("cell_pos", "cell")))
      .select(
        col("sim_hash"), col("t"), col("cell_pos").as("cell_idx"),
        col("cell.pressure").as("pressure"),
        col("cell.s").getItem(0).as("sw"),
        col("cell.s").getItem(1).as("sg"))
      .join(broadcast(activeIdx), Seq("cell_idx")) // the gather join
  }

  /** Golden long form: silver unpivoted to
    * (sim_hash, field, t, i, j, k, value) with F-order delinearization
    * (OP-X7: i = idx % I, j = (idx/I) % J, k = idx/(I·J)). */
  def golden(silverDF: DataFrame, dims: (Int, Int, Int)): DataFrame = {
    val (ii, jj, _) = dims
    silverDF
      .select(col("sim_hash"), col("t"), col("cell_idx"),
        expr("stack(3, 'pressure', pressure, 'water_saturation', sw, 'gas_saturation', sg) AS (field, value)"))
      .select(
        col("sim_hash"), col("field"), col("t"),
        (col("cell_idx") % ii).as("i"),
        ((col("cell_idx") / ii).cast("int") % jj).as("j"),
        (col("cell_idx") / (ii * jj)).cast("int").as("k"),
        col("value"))
  }

  /** Write golden partitioned by sim_hash (the reference's per-sim file
    * naming becomes real partition pruning — SURVEY §4). */
  def writeGolden(goldenDF: DataFrame, path: String): Unit =
    goldenDF.write.mode("overwrite").partitionBy("sim_hash").parquet(path)

  /** Golden as a managed table: partitioned by sim_hash AND bucketed by
    * timestep (SURVEY §4 "partition by sim_hash, cluster by t") — a
    * t-filtered scan touches only the matching buckets, and t-keyed
    * joins/aggregations are co-located. */
  def writeGoldenTable(goldenDF: DataFrame, table: String, nBuckets: Int = 8): Unit =
    goldenDF.write.mode("overwrite")
      .partitionBy("sim_hash")
      .bucketBy(nBuckets, "t").sortBy("t")
      .saveAsTable(table)

  /** Gather with observable metrics (OP-A5 the Spark way): the silver
    * plan carries a `df.observe` aggregation, so every action on the
    * result also reports (rows_gathered, distinct_sims) without a
    * second scan — read them from the returned Observation. */
  def silverObserved(states: DataFrame, actnum: DataFrame):
      (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation("silver_metrics")
    val df = silver(states, actnum).observe(obs,
      count(lit(1)).as("rows_gathered"),
      approx_count_distinct(col("sim_hash")).as("distinct_sims"))
    (df, obs)
  }

  /** OP-A1..A6 QA stats — the notebook's acceptance checks
    * (describeGolden): per (sim, field) min/max/count/null-count. */
  def describeGolden(goldenDF: DataFrame): DataFrame =
    goldenDF.groupBy(col("sim_hash"), col("field"))
      .agg(
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        count(col("value")).as("n_values"),
        count(when(col("value").isNull || isnan(col("value")), 1)).as("n_missing"),
        countDistinct(col("t")).as("n_timesteps"))

  /** Tabular export (OP-X9/F5/S7, tabular.py:117-129): nonzero cells in
    * long format `(simulation, timestamp, x, y, z, values)`. */
  def tabular(goldenDF: DataFrame, field: String, simIds: DataFrame): DataFrame =
    goldenDF
      .filter(col("field") === field && col("value") =!= 0.0 && col("value").isNotNull)
      .join(broadcast(simIds), Seq("sim_hash"))
      .select(
        col("sim_id").as("simulation"),
        col("t").as("timestamp"),
        col("i").as("x"), col("j").as("y"), col("k").as("z"),
        col("value").as("values"))

  def writeTabularCsv(tab: DataFrame, path: String): Unit =
    tab.write.mode("overwrite").option("header", true).csv(path)

  /** Dense 4D F-order array for one (sim, field) — the npy/zarr export
    * shape (OP-X8, arrays.py:88-143): value[idx + t*ncells] with NaN at
    * inactive/missing cells. Collects ncells×T doubles to the driver —
    * bounded by grid size (93,960 × ~24 ≈ 18 MB), NOT by row count. */
  def denseField(
      goldenDF: DataFrame, simHash: String, field: String,
      dims: (Int, Int, Int)): (Array[Double], Int) = {
    val (ii, jj, kk) = dims
    val ncells = ii * jj * kk
    val rows = goldenDF
      .filter(col("sim_hash") === simHash && col("field") === field)
      .select(
        (col("i") + lit(ii) * (col("j") + lit(jj) * col("k"))).as("cell_idx"),
        col("t"), col("value"))
      .collect()
    val nt = if (rows.isEmpty) 0 else rows.map(_.getInt(1)).max + 1
    val out = Array.fill(ncells * math.max(nt, 1))(Double.NaN)
    rows.foreach { r =>
      out(r.getInt(0) + ncells * r.getInt(1)) = r.getDouble(2)
    }
    (out, nt)
  }
}
