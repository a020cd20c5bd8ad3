package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Salted in-cluster pair joins at the 200k-vector decade — the
  * Σ cᵢ² mechanism under 10×-denser cells than BENCH_sfe, with the
  * TASK-TIME distribution measured (the thing salting exists to
  * flatten). Its own main (not a ScaleProbe section): the ~156M-pair
  * self-join wants a fresh heap — inside the 20-section ScaleProbe JVM
  * the accumulated state pushed the pair stage into GC-locker failure
  * at the default 16g.
  *
  * 200k vectors over two spike dims → ~256 balanced cells at ~780
  * rows each (Σ cᵢ² ≈ 156M pairs); `pairSalts = 16` vs `1` on the
  * SAME pair set — the max-task-time ratio is the flattening factor,
  * and identical edge counts prove the salt is pair-set-neutral.
  *
  * Run: SPARK_DRIVER_MEM=48g sbt "runMain graft.tools.SaltedKnnProbe"
  */
object SaltedKnnProbe {
  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 131072)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val knnVecs = spark.range(nVecs.toLong).select(
      col("id").as("vec_id"),
      expr("""transform(sequence(0, 63), d ->
              | CAST(CASE WHEN d = pmod(id, 64) THEN 1.0
              |       WHEN d = pmod(id DIV 64, 64) THEN 0.7
              |       ELSE CAST(pmod(id * (d + 17), 97) AS DOUBLE) / 1940.0
              |  END AS FLOAT))""".stripMargin).as("embedding"))
      .localCheckpoint(true)

    def saltedRun(salts: Int): (Double, Long, Long, Long) = {
      val times = new scala.collection.concurrent.TrieMap[
        Int, scala.collection.mutable.ArrayBuffer[Long]]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val buf = times.getOrElseUpdate(te.stageId,
            scala.collection.mutable.ArrayBuffer[Long]())
          buf.synchronized { buf += te.taskInfo.duration; () }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t = System.nanoTime()
      val n = graft.ext.Similarity.knnGraph(spark, knnVecs, k = 3,
        centroids = 256, dims = 64, pairSalts = salts).count()
      val secs = (System.nanoTime() - t) / 1e9
      Thread.sleep(2000) // listener delivery is async; drain before reading
      spark.sparkContext.removeSparkListener(listener)
      require(n > 0)
      val heavy = times.values.maxBy(_.sum).sortBy(-_)
      (secs, heavy.head, heavy(heavy.length / 2), n)
    }

    val (s16, max16, p5016, nEdges) = saltedRun(16)
    val (s1, max1, p501, n1) = saltedRun(1)
    require(nEdges == n1, s"salt changed the edge set: $nEdges != $n1")
    println(f"[probe] salted knn ($nVecs%d vecs, 256 cells, " +
      f"$nEdges%d edges): salts=16 $s16%.1fs, heavy-stage max task " +
      f"${max16 / 1000.0}%.1fs / p50 ${p5016 / 1000.0}%.1fs; salts=1 $s1%.1fs, " +
      f"max task ${max1 / 1000.0}%.1fs / p50 ${p501 / 1000.0}%.1fs — " +
      f"salting cuts the longest task ${max1.toDouble / max16}%.1f×")
    spark.stop()
  }
}
