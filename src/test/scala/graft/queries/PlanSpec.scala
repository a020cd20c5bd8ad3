package graft.queries

import graft.pumle.SparkSpec

/** Physical-plan shape assertions (the builder prompt's "explain and
  * iterate" discipline, pinned): filters reach the parquet scan, column
  * pruning holds, small dims broadcast, aggregates are partial+final,
  * and the hot paths stay inside whole-stage codegen. Run at sf0.001 —
  * plan shape, not data, is under test. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = Registry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q02: predicates pushed to the parquet scan, projection pruned") {
    val p = planOf("q02_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("LessThan(l_quantity,25"), p)
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
    // only the selected/filtered columns are read (no discount/tax/etc.)
    assert(!p.contains("l_discount"), p)
    assert(!p.contains("l_tax"), p)
  }

  test("q03: both dimension joins are broadcast hash joins") {
    val p = planOf("q03_join_enrich")
    assert("BroadcastHashJoin".r.findAllIn(p).length == 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q04: anti join against filtered orders broadcasts the small side") {
    val p = planOf("q04_anti_join")
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("PushedFilters"), p)
  }

  test("q01: aggregation is partial then final (map-side combine)") {
    val p = planOf("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    assert(p.contains("partial_"), p)
  }

  test("q51: minhash48 expression keeps the plan narrow (no aggregate, no explode)") {
    val p = planOf("q51_minhash_signature")
    assert(p.contains("minhash48"), p)
    assert(!p.contains("Generate"), p)      // no shingle explode
    assert(!p.contains("HashAggregate"), p) // no reduce-back aggregate
    // only the final orderBy exchanges data
    assert("Exchange".r.findAllIn(p).length <= 1, p)
  }

  test("q24: densify grid side is generated (Range), active side broadcast") {
    val p = planOf("q24_scatter_densify")
    assert(p.contains("Range"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("entry flagship returns rows at sf0.001 (driver smoke contract)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("registerAll exposes the star schema to spark.sql") {
    graft.core.Tables.registerAll(spark, sf)
    val r = spark.sql(
      """SELECT r_name, count(*) AS n FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
    assert(r.count() == 5)
    assert(spark.sql("SELECT count(*) FROM documents").head().getLong(0) > 0)
  }
}
