package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Dot64

/** Embedding clustering for corpus curation (topic balancing, cluster
  * sampling): Lloyd k-means with deterministic seeds and a fixed
  * iteration budget. Spec-pinned rather than oracle-checked — centroid
  * means are unordered FP sums, so cross-engine hash equality is not
  * meaningful (the same reason MLlib doesn't bit-pin k-means).
  *
  * Scale shape per iteration: the assignment is a per-row argmin over
  * the centroid list carried as a literal array column — fully narrow,
  * zero shuffles; the update is a (k·dims)-row aggregate collected to
  * the driver (driver-bounded by k·dims, never by corpus size) and
  * re-embedded. This is the classic distributed Lloyd layout.
  */
object Clustering {

  /** Run `iters` Lloyd iterations from the rows matching `seedPred`.
    * Returns the final assignment `(vec_id, cluster_id, dist2)`. */
  def kmeans(spark: SparkSession, emb: DataFrame,
      seedPred: org.apache.spark.sql.Column, iters: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    Dot64.register(spark)
    import spark.implicits._
    val base = emb.select(col(idCol).as("vec_id"),
      expr(s"transform($embCol, x -> CAST(x AS DOUBLE))").as("v"))
    var cents: Seq[(Long, Seq[Double])] = base.filter(seedPred)
      .select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    require(cents.nonEmpty, "seedPred matched no rows")

    def assign(c: Seq[(Long, Seq[Double])]): DataFrame = {
      // centroids ride along as ONE literal array column; the argmin is
      // a per-row array_min over structs (dist2 first, id tie-break) —
      // zero shuffles, unlike a crossJoin + per-vec_id window, which
      // would exchange n·k embedding-carrying rows per iteration
      base.withColumn("cents", typedLit(c))
        .withColumn("best", expr(
          """array_min(transform(cents, ct ->
            |  struct(dot64(v, v) - 2 * dot64(v, ct._2) + dot64(ct._2, ct._2) AS dist2,
            |         ct._1 AS cluster_id)))""".stripMargin))
        .select(col("vec_id"), col("v"),
          col("best.cluster_id").as("cluster_id"), col("best.dist2").as("dist2"))
    }

    var i = 0
    while (i < iters) {
      // update: per-(cluster, dim) mean — k·dims rows, driver-bounded
      val updated = assign(cents)
        .select(col("cluster_id"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy(col("cluster_id"), col("d")).agg(avg(col("x")).as("m"))
        .groupBy(col("cluster_id"))
        .agg(array_sort(collect_list(struct(col("d"), col("m")))).as("dm"))
        .select(col("cluster_id"), expr("transform(dm, e -> e.m)").as("cv"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
      // empty clusters keep their previous centroid
      val byId = updated.toMap
      cents = cents.map { case (id, old) => (id, byId.getOrElse(id, old)) }
      i += 1
    }
    assign(cents).select(col("vec_id"), col("cluster_id"), round(col("dist2"), 6).as("dist2"))
  }
}
