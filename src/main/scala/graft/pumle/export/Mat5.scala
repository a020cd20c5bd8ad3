package graft.pumle.export

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal MAT-5 (Level 5 MAT-file) writer (OP-S4) — the staging
  * hand-off the reference produces with scipy `savemat`
  * (/root/reference/src/pumle/mat_files.py:136-159). `savemat(file,
  * section_dict)` writes ONE TOP-LEVEL VARIABLE PER DICT KEY (numeric
  * scalar or char array) — NOT a struct — so MATLAB `load()` yields
  * `temp.pres_ref` and the solver sees `PARAMS.Fluid.pres_ref`
  * (co2lab3DPUMLE.m:34-44). `fileBytesVars` is that layout;
  * `fileBytes`/`structBytes` keep the 1×1-struct form for callers that
  * want a whole section as a single value. Format per the public MATLAB
  * Level 5 file-format spec (header, miMATRIX elements, miINT8 name,
  * mxSTRUCT/mxDOUBLE/mxCHAR classes, 8-byte-aligned tags).
  */
object Mat5 {

  private val miINT8 = 1
  private val miINT32 = 5
  private val miUINT16 = 17
  private val miDOUBLE = 9
  private val miMATRIX = 14
  private val mxDOUBLE = 6
  private val mxCHAR = 4
  private val mxSTRUCT = 2

  private def pad8(n: Int): Int = (8 - n % 8) % 8

  private def element(tpe: Int, payload: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + payload.length + pad8(payload.length))
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(tpe).putInt(payload.length).put(payload)
    buf.array()
  }

  private def arrayFlags(clazz: Int): Array[Byte] = {
    val out = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(6 /*miUINT32*/).putInt(8) // tag
    out.putInt(clazz).putInt(0)          // flags+class, reserved
    out.array()
  }

  private def dimsElement(rows: Int, cols: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(rows).putInt(cols)
    element(miINT32, b.array())
  }

  private def nameElement(name: String): Array[Byte] =
    element(miINT8, name.getBytes("ASCII"))

  /** 1×1 double matrix (unnamed when inside a struct). */
  private def doubleMatrix(name: String, v: Double): Array[Byte] = {
    val data = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    data.putDouble(v)
    matrix(mxDOUBLE, 1, 1, name, element(miDOUBLE, data.array()))
  }

  /** 1×n char row-vector matrix (scipy writes strings as mxCHAR/miUINT16). */
  private def charMatrix(name: String, s: String): Array[Byte] = {
    val data = ByteBuffer.allocate(s.length * 2).order(ByteOrder.LITTLE_ENDIAN)
    s.foreach(c => data.putShort(c.toShort))
    matrix(mxCHAR, 1, s.length, name, element(miUINT16, data.array()))
  }

  private def matrix(clazz: Int, rows: Int, cols: Int, name: String,
      dataElement: Array[Byte]): Array[Byte] = {
    val body = arrayFlags(clazz) ++ dimsElement(rows, cols) ++
      nameElement(name) ++ dataElement
    element(miMATRIX, body)
  }

  /** 1×1 struct with scalar-double / string fields, field order
    * preserved (scipy keeps dict order). */
  def structBytes(name: String, fields: Seq[(String, Any)]): Array[Byte] = {
    val fieldNameLen = 32
    val lenEl = {
      val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(fieldNameLen)
      element(miINT32, b.array())
    }
    val namesEl = {
      val b = ByteBuffer.allocate(fields.length * fieldNameLen)
      fields.foreach { case (fn, _) =>
        val bs = fn.getBytes("ASCII")
        require(bs.length < fieldNameLen, s"field name too long: $fn")
        b.put(bs); b.put(new Array[Byte](fieldNameLen - bs.length))
      }
      element(miINT8, b.array())
    }
    val fieldMats = fields.flatMap {
      case (_, v: Double) => doubleMatrix("", v)
      case (_, v: Int)    => doubleMatrix("", v.toDouble)
      case (_, v: String) => charMatrix("", v)
      case (_, v: Boolean) => doubleMatrix("", if (v) 1.0 else 0.0)
      case (fn, other) => throw new IllegalArgumentException(s"$fn: $other")
    }.toArray
    val body = arrayFlags(mxSTRUCT) ++ dimsElement(1, 1) ++
      nameElement(name) ++ lenEl ++ namesEl ++ fieldMats
    element(miMATRIX, body)
  }

  /** 128-byte MAT-5 file header (shared by both file layouts). */
  private def fileHeader(): Array[Byte] = {
    val header = new Array[Byte](128)
    val desc = "MATLAB 5.0 MAT-file, Platform: GRAFT, Created by: graft.pumle"
      .getBytes("ASCII")
    System.arraycopy(desc, 0, header, 0, math.min(desc.length, 116))
    java.util.Arrays.fill(header, desc.length, 116, ' '.toByte)
    val tail = ByteBuffer.wrap(header, 124, 4).order(ByteOrder.LITTLE_ENDIAN)
    tail.putShort(0x0100.toShort) // version
    tail.put('I'.toByte).put('M'.toByte) // endian indicator
    header
  }

  /** Full MAT-file: 128-byte header + one struct variable per section. */
  def fileBytes(vars: Seq[(String, Seq[(String, Any)])]): Array[Byte] =
    fileHeader() ++ vars.flatMap { case (n, fs) => structBytes(n, fs) }

  /** scipy-savemat layout: one top-level named variable per param
    * (mat_files.py:152 — `savemat(str(mat_file), content)` where
    * `content` is the section's param dict, key order preserved). */
  def fileBytesVars(vars: Seq[(String, Any)]): Array[Byte] = {
    fileHeader() ++ vars.flatMap {
      case (n, v: Double)  => doubleMatrix(n, v)
      case (n, v: Int)     => doubleMatrix(n, v.toDouble)
      case (n, v: Boolean) => doubleMatrix(n, if (v) 1.0 else 0.0)
      case (n, v: String)  => charMatrix(n, v)
      case (n, other) => throw new IllegalArgumentException(s"$n: $other")
    }
  }

  /** Staging write (mat_files.py:118-134): one `<Section>_<hash>.mat`
    * per section, section name sanitized exactly as the reference does
    * (`section.replace("-", "").replace(" ", "")`, mat_files.py:106-115
    * — `Pre-Processing` → `PreProcessing`). Each file holds one
    * top-level variable per param (savemat layout — see fileBytesVars),
    * which is what `load()` + `PARAMS.(section) = temp` expects. */
  def sanitizeSection(s: String): String = s.replace("-", "").replace(" ", "")

  def writeStaging(stagingDir: String, simHash: String,
      sections: Seq[(String, Seq[(String, Any)])]): Seq[String] = {
    Files.createDirectories(Paths.get(stagingDir))
    sections.map { case (section, fields) =>
      val fn = s"${sanitizeSection(section)}_$simHash.mat"
      val p = Paths.get(stagingDir, fn)
      Files.write(p, fileBytesVars(fields))
      p.toString
    }
  }
}
