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
