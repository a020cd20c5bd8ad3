package graft.pumle

import org.apache.spark.sql.functions._

/** Co-located (bucketed) join — the 100 TB fact-to-fact join strategy:
  * both sides pre-bucketed on the join key join WITHOUT any shuffle
  * (SURVEY §4 "partitioning & shuffle"; the golden/catalog tables use
  * the same mechanism at scale via sim_hash partitioning). */
class BucketingSpec extends SparkSpec {

  test("joining two tables bucketed on the key requires zero exchanges") {
    import spark.implicits._
    val li = (1L to 2000L).map(i => (i % 400, i, (i % 50).toDouble))
      .toDF("orderkey", "linekey", "qty")
    val ord = (1L to 400L).map(i => (i, s"cust_${i % 40}"))
      .toDF("orderkey", "cust")
    li.write.mode("overwrite").bucketBy(8, "orderkey").sortBy("orderkey")
      .saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "orderkey").sortBy("orderkey")
      .saveAsTable("ord_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the test exercises the co-located path the
      // way a fact-to-fact join at scale would
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), Seq("orderkey"))
        .groupBy(col("cust")).agg(sum(col("qty")).as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself shuffles nothing: the only exchange is the
      // post-join aggregation
      assert(plan.contains("SortMergeJoin"), plan)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 1, s"expected only the groupBy exchange:\n$plan")
      assert(joined.count() == 40)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
