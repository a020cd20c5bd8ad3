package graft.pumle.export

import java.io.File
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal Zarr v2 store writer (OP-S6) — the reference's chunked golden
  * sink (`zarr.save`, /root/reference/src/pumle/arrays.py:171-197), but
  * written the Spark-native way: ONE CHUNK PER TASK, in parallel, which
  * the single-process reference cannot do.
  *
  * Store layout per the public zarr v2 spec: `.zarray` JSON metadata +
  * raw little-endian chunk files named `i.j.k...` (compressor: none).
  */
object Zarr {

  private def zarray(shape: Seq[Int], chunks: Seq[Int]): String =
    s"""{"chunks": [${chunks.mkString(", ")}], "compressor": null,
       | "dtype": "<f8", "fill_value": "NaN", "filters": null, "order": "F",
       | "shape": [${shape.mkString(", ")}], "zarr_format": 2}""".stripMargin

  /** Write a (cell-long-form) DataFrame `(chunk_id, offset, value)` as a
    * zarr array chunked along the LAST axis (timestep) — chunk t writes
    * independently from its own task. `dims` = (I,J,K), one chunk per
    * timestep: shape (I,J,K,T), chunks (I,J,K,1).
    *
    * Rows: (t, cell_idx, value) with cell_idx in F-order. Missing cells
    * become NaN (fill value). */
  def writeByTimestep(rows: DataFrame, dims: (Int, Int, Int), nt: Int, path: String): Unit = {
    val (ii, jj, kk) = dims
    val ncells = ii * jj * kk
    new File(path).mkdirs()
    Files.write(Paths.get(path, ".zarray"),
      zarray(Seq(ii, jj, kk, nt), Seq(ii, jj, kk, 1)).getBytes("UTF-8"))
    // one task per timestep chunk
    rows.select(col("t").cast("int"), col("cell_idx").cast("int"), col("value").cast("double"))
      .repartition(math.min(nt, 64), col("t"))
      .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
        // stream rows into per-t chunk buffers (never buffer Row
        // objects); null values stay at the NaN fill
        val chunks = scala.collection.mutable.HashMap.empty[Int, Array[Double]]
        it.foreach { r =>
          val arr = chunks.getOrElseUpdate(r.getInt(0), Array.fill(ncells)(Double.NaN))
          if (!r.isNullAt(2)) arr(r.getInt(1)) = r.getDouble(2)
        }
        chunks.foreach { case (t, arr) =>
          val buf = ByteBuffer.allocate(ncells * 8).order(ByteOrder.LITTLE_ENDIAN)
          arr.foreach(buf.putDouble)
          Files.write(Paths.get(path, s"0.0.0.$t"), buf.array())
        }
      }
  }

  /** Read one timestep chunk back (test helper). */
  def readChunk(path: String, t: Int, ncells: Int): Array[Double] = {
    val bytes = Files.readAllBytes(Paths.get(path, s"0.0.0.$t"))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(ncells)(buf.getDouble())
  }

  /** Distributed zarr scan (OP-S6 read side — the reference opens the
    * store for tabular export, tabular.py:84 `zarr.open`): one Spark
    * task per chunk file, yielding `(t, cell_idx, value)` rows
    * (timestep-chunked layout as written by writeByTimestep). `.zarray`
    * is parsed driver-side; chunk files are listed and read through the
    * Hadoop FileSystem API, so the store can live on any scheme. NaN
    * fill cells are kept (callers filter) — the chunk is the parallelism
    * unit, exactly mirroring the write path. */
  def scan(spark: org.apache.spark.sql.SparkSession, path: String):
      org.apache.spark.sql.DataFrame = {
    import org.apache.hadoop.fs.{Path => HPath}
    import spark.implicits._
    val dir = new HPath(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaIn = fs.open(new HPath(dir, ".zarray"))
    val meta = try new String(metaIn.readAllBytes(), "UTF-8") finally metaIn.close()
    def intList(key: String): Seq[Int] =
      (s""""$key":\\s*\\[([0-9, ]*)\\]""").r.findFirstMatchIn(meta)
        .getOrElse(sys.error(s"no $key in .zarray")).group(1)
        .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    val shape = intList("shape")
    val chunks = intList("chunks")
    require(shape.length == 4 && chunks.take(3) == shape.take(3) && chunks(3) == 1,
      s"expected timestep-chunked 4D store, got shape=$shape chunks=$chunks")
    val ncells = shape(0) * shape(1) * shape(2)
    val chunkNames = fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.matches("0\\.0\\.0\\.[0-9]+")).toSeq.sorted
    // driver Hadoop conf shipped to tasks (see HadoopConfShip)
    val confEntries = HadoopConfShip.entries(spark.sparkContext.hadoopConfiguration)
    spark.createDataset(chunkNames)
      .repartition(chunkNames.length)
      .mapPartitions { it =>
        lazy val conf = HadoopConfShip.rebuild(confEntries)
        it.flatMap { name =>
          val t = name.substring(name.lastIndexOf('.') + 1).toInt
          val hp = new HPath(s"$path/$name")
          val in = hp.getFileSystem(conf).open(hp)
          val bytes = try in.readAllBytes() finally in.close()
          val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
          // stream rows off the byte buffer — only the raw chunk stays
          // resident, not a boxed tuple per cell
          (0 until ncells).iterator.map(c => (t, c, buf.getDouble(c * 8)))
        }
      }
      .toDF("t", "cell_idx", "value")
  }
}
