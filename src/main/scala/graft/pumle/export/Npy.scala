package graft.pumle.export

import java.io.{DataOutputStream, FileOutputStream, BufferedOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal NPY v1.0 writer/reader (OP-S5) for float64 Fortran-order
  * arrays — the reference's golden sink (`np.save`,
  * /root/reference/src/pumle/arrays.py:149-169). Format per the public
  * NumPy .npy spec; byte-golden-tested against a numpy-generated
  * fixture (src/test/resources/numpy_oracle.json).
  */
object Npy {

  /** Header: magic, version 1.0, padded dict literal. */
  private def header(shape: Seq[Int], fortran: Boolean): Array[Byte] = {
    val dict = s"{'descr': '<f8', 'fortran_order': ${if (fortran) "True" else "False"}, " +
      s"'shape': (${shape.mkString(", ")}${if (shape.length == 1) "," else ""}), }"
    // total header (magic 6 + 2 version + 2 len + dict + pad + \n) % 64 == 0
    val base = 6 + 2 + 2
    val padTo = 64
    val total = ((base + dict.length + 1 + padTo - 1) / padTo) * padTo
    val padded = dict + (" " * (total - base - dict.length - 1)) + "\n"
    val buf = ByteBuffer.allocate(base + padded.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0x93.toByte).put("NUMPY".getBytes("ASCII"))
    buf.put(1.toByte).put(0.toByte)
    buf.putShort(padded.length.toShort)
    buf.put(padded.getBytes("ASCII"))
    buf.array()
  }

  /** Serialize a float64 array (data already in the flat order implied
    * by `fortran`). */
  def toBytes(data: Array[Double], shape: Seq[Int], fortran: Boolean = true): Array[Byte] = {
    require(shape.product == data.length, s"shape $shape != ${data.length} values")
    val h = header(shape, fortran)
    val buf = ByteBuffer.allocate(h.length + data.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(h)
    data.foreach(buf.putDouble)
    buf.array()
  }

  def write(path: String, data: Array[Double], shape: Seq[Int], fortran: Boolean = true): Unit = {
    val out = new BufferedOutputStream(new FileOutputStream(path))
    try out.write(toBytes(data, shape, fortran)) finally out.close()
  }

  /** Header-only parse from a stream: (dataOffset, shape, fortran). */
  private def readHeader(in: java.io.DataInput): (Long, Seq[Int], Boolean) = {
    val magic = new Array[Byte](6); in.readFully(magic)
    require(magic(0) == 0x93.toByte && new String(magic, 1, 5, "ASCII") == "NUMPY", "not npy")
    in.readByte(); in.readByte() // version
    val hlen = java.lang.Short.toUnsignedInt(java.lang.Short.reverseBytes(in.readShort()))
    val hdr = new Array[Byte](hlen); in.readFully(hdr)
    val h = new String(hdr, "ASCII")
    require(h.contains("'<f8'"), s"unsupported dtype in $h")
    val fortran = h.contains("'fortran_order': True")
    val shape = "\\((.*?)\\)".r.findFirstMatchIn(h).get.group(1)
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    (10L + hlen, shape, fortran)
  }

  /** Distributed npy scan (OP-S5 read side — the reference reads golden
    * arrays back for tabular export, tabular.py:74-98 `np.load`):
    * `(idx, value)` rows where `idx` is the position in the file's flat
    * storage order. The tiny header is read driver-side; the data
    * section splits into contiguous index ranges, one Spark task each,
    * reading through the Hadoop FileSystem API (file:// here, hdfs:// /
    * s3a:// on a cluster) in bounded ~8 MiB seek-read blocks — no task
    * ever holds the whole array, so a 100 GB npy scans like any other
    * splittable source. Returns (df, shape, fortran). */
  def scan(spark: org.apache.spark.sql.SparkSession, path: String,
      splits: Int = 0,
      blockElems: Int = 1 << 20): (org.apache.spark.sql.DataFrame, Seq[Int], Boolean) = {
    require(blockElems > 0, s"blockElems must be positive, got $blockElems")
    import org.apache.hadoop.fs.{Path => HPath}
    import spark.implicits._
    val hp = new HPath(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (dataOff, shape, fortran) = {
      val in = fs.open(hp)
      try readHeader(in) finally in.close()
    }
    val n = shape.map(_.toLong).product
    val nSplits = math.max(1, if (splits > 0) splits
      else math.min(spark.sparkContext.defaultParallelism, (n / 65536 + 1).toInt))
    val ranges = (0 until nSplits)
      .map(s => (n * s / nSplits, n * (s + 1) / nSplits))
      .filter { case (lo, hi) => hi > lo }
    // blockElems (default 8 MiB of doubles) bounds per-read buffer size
    // the driver's Hadoop conf (incl. spark.hadoop.* overrides — s3a
    // credentials, HA namenodes) rides into the closure as k/v pairs
    val confEntries = HadoopConfShip.entries(spark.sparkContext.hadoopConfiguration)
    val df = spark.createDataset(ranges)
      .repartition(ranges.length)
      .mapPartitions { it =>
        lazy val conf = HadoopConfShip.rebuild(confEntries)
        it.flatMap { case (lo, hi) =>
          // ONE open + seek per range; blocks read sequentially into a
          // bounded buffer (a 1 GB range is 1 open, not 128)
          val hp2 = new HPath(path)
          val in = hp2.getFileSystem(conf).open(hp2)
          in.seek(dataOff + lo * 8)
          (lo until hi by blockElems).iterator.flatMap { b0 =>
            val bEnd = math.min(b0 + blockElems, hi)
            val buf = new Array[Byte](((bEnd - b0) * 8).toInt)
            in.readFully(buf)
            if (bEnd == hi) in.close()
            val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
            (b0 until bEnd).iterator.map(i => (i, bb.getDouble))
          }
        }
      }
      .toDF("idx", "value")
    (df, shape, fortran)
  }

  /** npy → golden long form for one (sim, field): a 4D F-order dense
    * export read back as `(t, i, j, k, value)` rows, NaN fill dropped —
    * the inverse of Pipeline.denseField + write. */
  def scanGolden(spark: org.apache.spark.sql.SparkSession, path: String):
      org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val (df, shape, fortran) = scan(spark, path)
    require(shape.length == 4 && fortran, s"expected 4D F-order golden, got $shape")
    val Seq(ii, jj, kk, _) = shape
    val ncells = ii.toLong * jj * kk
    df.filter(!isnan(col("value")))
      .select(
        expr(s"CAST(idx DIV ${ncells}L AS INT)").as("t"),
        expr(s"CAST(idx % $ii AS INT)").as("i"),
        expr(s"CAST((idx DIV $ii) % $jj AS INT)").as("j"),
        expr(s"CAST((idx DIV ${ii.toLong * jj}L) % $kk AS INT)").as("k"),
        col("value"))
  }

  /** Read a v1.0/<f8 npy back: (flat data, shape, fortran_order). */
  def read(bytes: Array[Byte]): (Array[Double], Seq[Int], Boolean) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](6); buf.get(magic)
    require(magic(0) == 0x93.toByte && new String(magic, 1, 5, "ASCII") == "NUMPY", "not npy")
    buf.get(); buf.get() // version
    val hlen = buf.getShort()
    val hdr = new Array[Byte](hlen); buf.get(hdr)
    val h = new String(hdr, "ASCII")
    require(h.contains("'<f8'"), s"unsupported dtype in $h")
    val fortran = h.contains("'fortran_order': True")
    val shape = "\\((.*?)\\)".r.findFirstMatchIn(h).get.group(1)
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    val n = shape.product
    val data = Array.fill(n)(buf.getDouble())
    (data, shape, fortran)
  }
}
