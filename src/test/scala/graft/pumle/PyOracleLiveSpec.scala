package graft.pumle

import org.scalatest.funsuite.AnyFunSuite

/** LIVE cross-language fidelity: pipe randomly-generated params through
  * the actual CPython interpreter (json.dumps + hashlib.md5 — the exact
  * reference code path, utils.py:52-81) and require byte equality with
  * PyJson. Stronger than the committed fixture vectors: fresh inputs
  * every run. Skips cleanly when python3 is unavailable. */
class PyOracleLiveSpec extends AnyFunSuite {

  private def python3Available: Boolean =
    try {
      val p = new ProcessBuilder("python3", "-c", "print(1)").start()
      p.waitFor() == 0
    } catch { case _: Exception => false }

  test("printfE matches live CPython %.2e and %.6e on 2000 random doubles") {
    assume(python3Available, "python3 not on PATH")
    val rnd = new scala.util.Random(4242L)
    val vals = (1 to 2000).map { _ =>
      rnd.nextInt(4) match {
        case 0 => rnd.nextDouble()
        case 1 => (rnd.nextDouble() - 0.5) * 2e12
        case 2 => (rnd.nextDouble() - 0.5) * 2e-12
        case _ => java.lang.Double.longBitsToDouble(rnd.nextLong()) match {
          case d if d.isNaN || d.isInfinite => 1.065e-7 // the q26 bug shape
          case d => d
        }
      }
    }
    val payload = vals.map(v => java.lang.Double.doubleToLongBits(v)).mkString("\n")
    val script =
      """import sys, struct
        |for line in sys.stdin.read().split():
        |    v = struct.unpack('<d', struct.pack('<q', int(line)))[0]
        |    print(('%.2e' % v) + '|' + ('%.6e' % v))
        |""".stripMargin
    val pb = new ProcessBuilder("python3", "-c", script)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    proc.getOutputStream.write(payload.getBytes("UTF-8"))
    proc.getOutputStream.close()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor() == 0, out.take(300))
    vals.zip(out.trim.split("\n")).foreach { case (v, line) =>
      val Array(e2, e6) = line.split("\\|")
      assert(PyJson.printfE(v, 2) == e2, s"%.2e of $v")
      assert(PyJson.printfE(v, 6) == e6, s"%.6e of $v")
    }
  }

  test("canonical JSON + hash match live CPython on 300 random param dicts") {
    assume(python3Available, "python3 not on PATH")
    val rnd = new scala.util.Random(20260812L)
    val cases = (1 to 300).map { i =>
      val nKeys = 1 + rnd.nextInt(6)
      (1 to nKeys).map { k =>
        val key = s"p${rnd.nextInt(1000)}_$k"
        val v: Double = rnd.nextInt(5) match {
          case 0 => rnd.nextDouble()
          case 1 => (rnd.nextDouble() - 0.5) * 2e18
          case 2 => (rnd.nextDouble() - 0.5) * 2e-9
          case 3 => rnd.nextInt(1000).toDouble
          case _ => java.lang.Double.longBitsToDouble(rnd.nextLong()) match {
            case d if d.isNaN || d.isInfinite => 42.0
            case d => d
          }
        }
        key -> v
      }.toMap[String, Any]
    }
    // hand python the raw IEEE bits so transport cannot round
    val payload = cases.map(_.toSeq.sortBy(_._1).map { case (k, v) =>
      s"$k=${java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])}"
    }.mkString(",")).mkString("\n")
    val script =
      """import sys, json, hashlib, struct
        |for line in sys.stdin.read().splitlines():
        |    d = {}
        |    for kv in line.split(','):
        |        k, bits = kv.split('=')
        |        d[k] = struct.unpack('<d', struct.pack('<q', int(bits)))[0]
        |    s = json.dumps(d, sort_keys=True)
        |    print(hashlib.md5(s.encode()).hexdigest()[:8] + '|' + s)
        |""".stripMargin
    val pb = new ProcessBuilder("python3", "-c", script)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    proc.getOutputStream.write(payload.getBytes("UTF-8"))
    proc.getOutputStream.close()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor() == 0, out.take(500))
    val lines = out.trim.split("\n")
    assert(lines.length == cases.length)
    cases.zip(lines).foreach { case (params, line) =>
      val Array(expHash, expJson) = line.split("\\|", 2)
      assert(PyJson.canonicalJson(params) == expJson)
      assert(PyJson.paramHash(params) == expHash)
    }
  }
}
