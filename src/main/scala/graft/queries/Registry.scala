package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: the Spark implementation plus (when SQL-expressible)
  * an equivalent DuckDB oracle SQL over the same parquet tables.
  *
  * Contract notes (driver compare, see builder prompt):
  *  - column names must match between Spark output and oracle output;
  *  - results should be deterministically ordered (both sides ORDER BY a
  *    unique key) — we never rely on the comparator sorting rows;
  *  - double-typed aggregates route through DECIMAL casts when the summed
  *    terms are not exactly representable, so that summation order cannot
  *    produce ULP-level divergence between Spark and DuckDB.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Registry {
  lazy val all: Seq[Q] =
    RelationalQueries.qs ++ SweepQueries.qs ++ PhysicsQueries.qs ++
      ExtQueries.qs ++ Ext2Queries.qs ++ Ext3Queries.qs ++ Ext4Queries.qs ++
      Ext5Queries.qs ++ Ext6Queries.qs ++ Ext7Queries.qs

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
