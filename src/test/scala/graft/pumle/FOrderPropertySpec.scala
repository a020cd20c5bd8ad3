package graft.pumle

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the correctness-critical F-order
  * linearization (OP-X7 — "core correctness trap", SURVEY §2.6) and the
  * scatter/gather identity (OP-X8/F3). */
object FOrderPropertySpec extends Properties("FOrder") {

  private val dimGen = Gen.choose(1, 40)

  property("linearize/delinearize bijective") = Prop.forAll(
    dimGen, dimGen, dimGen) { (ii, jj, kk) =>
    val idxGen = Gen.choose(0, ii * jj * kk - 1)
    Prop.forAll(idxGen) { idx =>
      val i = idx % ii
      val j = (idx / ii) % jj
      val k = idx / (ii * jj)
      i + ii * (j + jj * k) == idx && i < ii && j < jj && k < kk
    }
  }

  property("scatter then gather is identity on active cells") = Prop.forAll(
    Gen.choose(2, 20), Gen.choose(2, 10), Gen.choose(1, 5)) { (ii, jj, kk) =>
    val n = ii * jj * kk
    Prop.forAll(Gen.listOfN(n, Gen.oneOf(true, false))) { mask =>
      val active = mask.zipWithIndex.collect { case (true, i) => i }
      val values = active.map(i => i * 1.5)
      // scatter into dense NaN-filled array (OP-X8)
      val dense = Array.fill(n)(Double.NaN)
      active.zip(values).foreach { case (i, v) => dense(i) = v }
      // gather back (OP-F3)
      val gathered = active.map(dense)
      gathered == values && dense.count(!_.isNaN) == active.length
    }
  }

  property("pyFloatRepr stable under repeated encode") = Prop.forAll(
    Gen.choose(-1e12, 1e12)) { d =>
    val s = PyJson.pyFloatRepr(d)
    PyJson.pyFloatRepr(s.toDouble) == s
  }
}
