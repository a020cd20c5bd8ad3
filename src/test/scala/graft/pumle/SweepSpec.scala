package graft.pumle

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** OP-X10/X11/W2: linspace + meshgrid enumeration pinned against numpy
  * oracle vectors (src/test/resources/numpy_oracle.json —
  * np.meshgrid(*lists).T.reshape(-1,k), the exact code path of
  * /root/reference/src/pumle/parameters_variation.py:125-136). */
class SweepSpec extends AnyFunSuite {

  private lazy val oracle = JsonMethods.parse(
    scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/numpy_oracle.json"), "UTF-8").mkString)

  private def meshOracle(key: String): Vector[Vector[Double]] =
    (oracle \ key).asInstanceOf[JArray].arr.map(row =>
      row.asInstanceOf[JArray].arr.map {
        case JDouble(d) => d
        case JInt(i)    => i.toDouble
        case other      => fail(s"$other")
      }.toVector).toVector

  private val a = Vector(1.0, 2.0, 3.0)
  private val b = Vector(10.0, 20.0)
  private val c = Vector(100.0, 200.0)
  private val d4 = Vector(7.0, 8.0)

  test("meshgridT matches numpy for k=2,3,4") {
    assert(Sweep.meshgridT(Seq(a, b)) == meshOracle("mesh2"))
    assert(Sweep.meshgridT(Seq(a, b, c)) == meshOracle("mesh3"))
    assert(Sweep.meshgridT(Seq(a, b, c, d4)) == meshOracle("mesh4"))
  }

  test("linspace matches numpy endpoint semantics") {
    val ls = Sweep.linspace(0.0, 1.0, 5)
    assert(ls == Vector(0.0, 0.25, 0.5, 0.75, 1.0))
    assert(Sweep.linspace(1.0, 2.0, 2) == Vector(1.0, 2.0))
    // endpoint exact even when step is inexact
    assert(Sweep.linspace(0.0, 0.3, 4).last == 0.3)
  }

  test("points rule max(min(1/delta,100),2) — parameters_variation.py:78-84") {
    assert(Sweep.pointsFor(0.5) == 2)
    assert(Sweep.pointsFor(0.25) == 4)
    assert(Sweep.pointsFor(0.3) == 3)   // int(1/0.3)=3
    assert(Sweep.pointsFor(0.005) == 100)
    assert(Sweep.pointsFor(1.0) == 2)   // floor(1)=1 → clamped to 2
  }

  test("generateVariations: delta=0 yields single base variant with stable hash") {
    val base = Map[String, Any]("pe" -> 5.0, "srw" -> 0.11)
    val vs = Sweep.generateVariations(base, Seq("pe"), 0.0)
    assert(vs.length == 1 && vs.head.simId == 1)
    assert(vs.head.simHash == PyJson.paramHash(base))
  }

  test("generateVariations: ordering and hashing are deterministic") {
    val base = Map[String, Any]("pe" -> 5.0, "srw" -> 0.1, "src" -> 0.2)
    val vs = Sweep.generateVariations(base, Seq("pe", "srw"), 0.5)
    assert(vs.length == 4) // 2 points per param
    assert(vs.map(_.simId) == (1 to 4).toVector)
    // limits clamp: pe in [0.1,10] → 5*(1±0.5)=[2.5,7.5]; srw clamped at 0.3 hi
    assert(vs.head.params("pe") == 2.5)
    val again = Sweep.generateVariations(base, Seq("pe", "srw"), 0.5)
    assert(vs.map(_.simHash) == again.map(_.simHash))
    assert(vs.map(_.simHash).distinct.length == 4)
  }

  test("variation range honors physical limits (parameters.py:99-115)") {
    assert(Config.variationRange("srw", 0.25, 0.5) == (0.125, 0.3))
    assert(Config.variationRange("pe", 5.0, 0.5) == (2.5, 7.5))
  }
}
