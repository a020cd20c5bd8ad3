package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted executed plan of named registry queries —
  * the `.explain("formatted")` feedback loop as a one-liner:
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ExplainQ q132_sq_search"
  *
  * Plans build against the configured sfDir (fixtures build eagerly,
  * exactly as a bench shot would), so what prints is what runs. */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainQ <query name>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 131072)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.Functions.registerAll(spark)
    args.foreach { name =>
      val fn = graft.queries.Registry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      println(s"===== $name =====")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
