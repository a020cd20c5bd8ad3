package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — every left row enriched with the value
  * of the latest right row at or before its timestamp, per key. The
  * classic time-series operator Spark lacks as a builtin, expressed in
  * the SHUFFLE-ONCE formulation: tag both sides, union, and take an
  * ignore-nulls running `last` over (key, time) — one hash exchange on
  * the key, one sort within partitions, no range join and no per-row
  * probe. A join-based formulation (`l.ts >= r.ts` range join +
  * greatest-ts dedup) explodes to O(|L|·|R|) per key at scale; this one
  * is O(|L|+|R|) rows through a single window.
  *
  * Tie semantics: right rows sort BEFORE left rows at an equal
  * timestamp (the "at or before" contract — a quote at t is visible to
  * a trade at t); within a side, `tieCol` (a unique id) pins a total
  * order so results are deterministic under any partitioning.
  */
object AsOf {

  /** Left rows (all columns) + `outCol` = latest `valueCol` from
    * `right` with `right.tsCol <= left.tsCol`, matched on `keys`,
    * null when no right row precedes. `tieCol` must be unique per row
    * within each side (an event id). */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, tieCol: String, valueCol: String,
      outCol: String = "asof_value"): DataFrame = {
    val vType = right.schema(valueCol).dataType
    val payload = left.columns.toSeq
      .filterNot(c => keys.contains(c) || c == tsCol || c == tieCol)
    val l = left.select(
      keys.map(col) ++ Seq(col(tsCol), col(tieCol)) ++ payload.map(col) ++
        Seq(lit(1).as("__side"), lit(null).cast(vType).as("__v")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(tsCol), col(tieCol)) ++
        payload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("__side"), col(valueCol).as("__v")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionAll(r)
      .withColumn(outCol, last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__v")
  }
}
