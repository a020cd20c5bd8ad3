package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot diagnostic: does a repartition(col) survive
  * localCheckpoint so downstream groupBy/join skip their exchanges?
  * Prints the executed plan of one clusters() hop shape. */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val pairs = (1L to 2000L).map(i => (i, i % 97)).toDF("a_id", "b_id")
    val edges = pairs.unionAll(pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .repartition(col("b_id")).distinct().localCheckpoint(true)
    println("=== edges partitioning: " +
      edges.queryExecution.executedPlan.outputPartitioning)
    val labels = edges.select(col("b_id").as("node")).distinct()
      .withColumn("cluster_id", col("node")).localCheckpoint(true)
    println("=== labels init plan (want: NO hash exchange)")
    edges.select(col("b_id").as("node")).distinct().explain()
    val via = edges.join(labels, edges("b_id") === labels("node"))
      .select(col("a_id").as("node"), col("cluster_id"))
    val hop = labels.select(col("node"), col("cluster_id"))
      .unionAll(via)
      .groupBy(col("node")).agg(min(col("cluster_id")).as("cluster_id"))
    println("=== hop plan (want: edges/labels sides exchange-free)")
    hop.explain()
    spark.stop()
  }
}
