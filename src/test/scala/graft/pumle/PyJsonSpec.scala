package graft.pumle

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** OP-X1/X2/O1 byte-fidelity against Python-generated oracle vectors
  * (src/test/resources/hash_oracle.json, produced by json.dumps +
  * hashlib.md5 — the exact code path of
  * /root/reference/src/pumle/utils.py:52-81). */
class PyJsonSpec extends AnyFunSuite {

  private lazy val vectors: List[(Map[String, Any], String, String, String)] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/hash_oracle.json"), "UTF-8").mkString
    JsonMethods.parse(src).asInstanceOf[JArray].arr.map { v =>
      val params = (v \ "params").asInstanceOf[JObject].obj.map {
        case (k, JDouble(d)) => k -> (d: Any)
        case (k, JInt(i))    => k -> (i.toDouble: Any)
        case (k, JString(s)) => k -> (s: Any)
        case (k, JBool(b))   => k -> (b: Any)
        case (k, other)      => fail(s"unexpected $k -> $other")
      }.toMap
      val JString(canon) = (v \ "canonical"): @unchecked
      val JString(hash) = (v \ "hash"): @unchecked
      val JString(fn) = (v \ "filename"): @unchecked
      (params, canon, hash, fn)
    }
  }

  test("canonical JSON matches python json.dumps(sort_keys=True) byte-for-byte") {
    vectors.foreach { case (params, canon, _, _) =>
      assert(PyJson.canonicalJson(params) == canon)
    }
  }

  test("param hash matches python md5 8-hex-char oracle") {
    vectors.foreach { case (params, _, hash, _) =>
      assert(PyJson.paramHash(params) == hash)
    }
  }

  test("filename string matches python %.2e encoding oracle") {
    vectors.foreach { case (params, _, _, fn) =>
      assert(PyJson.filenameString(params) == fn)
    }
  }

  test("reference-observed golden filename prefix reproduces (SURVEY §2.6 OP-X2)") {
    val fluid = Map[String, Any](
      "pres_ref" -> 35.0, "temp_ref" -> 95.15, "cp_rock" -> 4e-05,
      "srw" -> 0.11, "src" -> 0.21, "pe" -> 5.0, "XNaCl" -> 0.1,
      "rho_h2o" -> 1000.0)
    val fn = PyJson.filenameString(fluid)
    // notebook cell 1: XNaCl_1p00em01_cp_rock_4p00em05_pe_5p00e00_pres_ref_3p50e01_...
    assert(fn.startsWith("XNaCl_1p00em01_cp_rock_4p00em05_pe_5p00e00_pres_ref_3p50e01"))
  }

  test("pyFloatRepr round-trips finite doubles (seeded property sweep)") {
    val rnd = new scala.util.Random(42)
    val edge = Seq(0.0, -0.0, 1e16, 1e15, 9.999999999999998e15, 1e-4,
      9.9e-5, 5e-324, Double.MaxValue, Double.MinPositiveValue)
    val samples = edge ++ (1 to 20000).map { _ =>
      rnd.nextInt(4) match {
        case 0 => rnd.nextDouble()
        case 1 => (rnd.nextDouble() - 0.5) * 2e300
        case 2 => (rnd.nextDouble() - 0.5) * 2e-300
        case _ => java.lang.Double.longBitsToDouble(rnd.nextLong()) match {
          case d if d.isNaN || d.isInfinite => 1.5
          case d => d
        }
      }
    }
    samples.foreach { d =>
      assert(PyJson.pyFloatRepr(d).toDouble == d, s"repr mismatch for $d")
    }
  }

  test("pyFloatRepr formatting thresholds match CPython") {
    assert(PyJson.pyFloatRepr(1e16) == "1e+16")
    assert(PyJson.pyFloatRepr(1e15) == "1000000000000000.0")
    assert(PyJson.pyFloatRepr(1e-4) == "0.0001")
    assert(PyJson.pyFloatRepr(1e-5) == "1e-05")
    assert(PyJson.pyFloatRepr(-0.0) == "-0.0")
    assert(PyJson.pyFloatRepr(35.0) == "35.0")
    assert(PyJson.pyFloatRepr(0.30000000000000004) == "0.30000000000000004")
  }
}
