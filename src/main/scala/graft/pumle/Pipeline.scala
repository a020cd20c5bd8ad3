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

  private[pumle] val stateStruct = StructType(Seq(
    StructField("pressure", ArrayType(DoubleType)),
    StructField("s", ArrayType(ArrayType(DoubleType)))))

  /** sim_hash from `..._<hash>.json` — anchored at the END of the name
    * so case_names containing underscores (case_name is user config)
    * cannot break the extraction (sim_results_parser.py:69-74). */
  def simHashFromFile: org.apache.spark.sql.Column =
    regexp_extract(input_file_name(), "_([0-9a-f]{8})\\.json$", 1)

  /** Format-tolerant parse of a whole-file JSON text column into an
    * array column (bare top-level array or `{"<field>": [...]}`). */
  def jsonArrayColumn(raw: org.apache.spark.sql.Column, wrappedField: String,
      elem: DataType): org.apache.spark.sql.Column =
    when(ltrim(raw).startsWith("["), from_json(raw, ArrayType(elem)))
      .otherwise(from_json(raw,
        StructType(Seq(StructField(wrappedField, ArrayType(elem)))))
        .getField(wrappedField))

  /** States-array specialization (shared with graft.streaming). */
  def statesArrayColumn(raw: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    jsonArrayColumn(raw, "states", stateStruct)

  /** Whole-file read + format-tolerant array parse: the solver emits
    * BARE top-level arrays (`jsonencode(states)` etc.,
    * co2lab3DPUMLE.m:517-559) while fixtures may wrap them in an
    * object — accept both. */
  private def readJsonArray(spark: SparkSession, path: String,
      wrappedField: String, elem: DataType): DataFrame =
    spark.read.option("wholetext", true).text(path)
      .select(
        input_file_name().as("file"),
        jsonArrayColumn(col("value"), wrappedField, elem).as("arr"))

  /** Read one-or-many bronze states JSONs — the solver's bare
    * `jsonencode(states)` array or the `{"states":[...]}` wrapped form.
    * `sim_hash` comes from the `states_<case>_<hash>.json` file name. */
  def readBronzeStates(spark: SparkSession, path: String): DataFrame =
    readJsonArray(spark, path, "states", stateStruct)
      .select(col("arr").as("states"), simHashFromFile.as("sim_hash"))

  /** Bronze read with amortization — the reference's `lru_cache` analog
    * (sim_results_parser.py:142, SURVEY §2.8): the typical entry-point-B
    * drive consumes bronze TWICE (QA via gatherDropStats + the silver/
    * golden path), and whole-file JSON parse is the expensive step, so
    * cache the parsed frame. MEMORY_AND_DISK: a bronze batch larger than
    * executor memory spills instead of recomputing the parse. Callers
    * `unpersist()` when the batch is done. */
  def readBronzeStatesCached(spark: SparkSession, path: String): DataFrame =
    readBronzeStates(spark, path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** ACTNUM mask JSON (`grdecl_<case>_<hash>.json`, a 0/1 array in
    * F-order over all I·J·K cells — sim_results_parser.py:207-214;
    * bare `jsonencode(grdecl.ACTNUM)` or wrapped) → (cell_idx, active). */
  def readActnum(spark: SparkSession, path: String): DataFrame =
    readJsonArray(spark, path, "actnum", IntegerType)
      .select(posexplode(col("arr")).as(Seq("cell_idx", "flag")))
      .select(col("cell_idx"), (col("flag") === 1).as("active"))

  /** Grid dims JSON (`g_<case>.json` = [I,J,K], bare or wrapped —
    * sim_results_parser.py:180-190). Driver-side scalar read. */
  def readDims(spark: SparkSession, path: String): (Int, Int, Int) = {
    val row = readJsonArray(spark, path, "dims", IntegerType)
      .select(col("arr")).head()
    require(!row.isNullAt(0), s"unparseable dims file at $path") // OP-V2
    val arr = row.getSeq[Int](0)
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
    * (OP-F1/F3/J3). Index bounds (OP-F2) are enforced structurally:
    * positions beyond the state-array length simply do not exist after
    * posexplode, matching the reference's drop of out-of-range active
    * indices. A shorter `s` array than `pressure` null-pads via
    * arrays_zip — surfaced by silverObserved's `null_saturation_rows`
    * metric and by gatherDropStats (OP-A5/V3). */
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
      approx_count_distinct(col("sim_hash")).as("distinct_sims"),
      count(when(col("sw").isNull || col("sg").isNull, 1))
        .as("null_saturation_rows"))
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
      // null values (e.g. saturation null-padded by a short `s` array)
      // stay NaN, matching the reference's missing-cell fill
      if (!r.isNullAt(2)) out(r.getInt(0) + ncells * r.getInt(1)) = r.getDouble(2)
    }
    (out, nt)
  }
}
