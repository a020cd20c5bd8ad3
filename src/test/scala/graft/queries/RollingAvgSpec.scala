package graft.queries

import org.apache.spark.sql.functions._

import graft.pumle.SparkSpec

/** q34 rolling-frame window vs a brute-force per-key computation. */
class RollingAvgSpec extends SparkSpec {

  test("q34 rolling avg equals the brute-force 3-event trailing mean") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 300).map { i =>
      (i.toLong, (i % 7).toLong, rnd.nextLong(1000000L), rnd.nextDouble() * 100)
    } // (event_id, user_id, ts, value)
    val dir = java.nio.file.Files.createTempDirectory("rolling").toString
    rows.toDF("event_id", "user_id", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = Registry.queries("q34_rolling_avg")(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("n_in_frame"), r.getAs[Double]("rolling_avg"))).toMap

    rows.groupBy(_._2).foreach { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._3, e._1))
      ordered.zipWithIndex.foreach { case (e, i) =>
        val frame = ordered.slice(math.max(0, i - 2), i + 1)
        // mirror the engine's decimal discipline: per-term 6-dp rounding
        val sum = frame.map(x => BigDecimal(x._4).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
        val want = BigDecimal(sum.toDouble / frame.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val (n, avg) = got(e._1)
        assert(n == frame.size, s"frame size for event ${e._1}")
        assert(math.abs(avg - want) < 1e-9, s"event ${e._1}: got $avg want $want")
      }
    }
  }
}
