package graft.pumle

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parameter-sweep generation (OP-X10/X11/X1/W2/J2 — SURVEY.md §2.6).
  *
  * Reproduces the reference's sweep semantics exactly:
  *  - points rule `max(min(⌊1/δ⌋,100),2)` per varied parameter
  *    (/root/reference/src/pumle/parameters_variation.py:66-84);
  *  - `np.linspace` over the limit-clamped range (ibid.:148-154);
  *  - `np.meshgrid(*lists).T.reshape(-1,k)` enumeration order — axes
  *    slowest→fastest are (k, k-1, …, 3, 1, 2); sim_id = position+1
  *    (ibid.:125-136, :184-192) — pinned against numpy oracle vectors;
  *  - sim_hash over the full Fluid dict (pumle.py:202).
  *
  * The combo list is tiny driver-side data (≤100^k bounded by config);
  * `toDF` seeds the distributed pipeline, and the catalog upsert
  * (graft.pumle.Catalog) is the scalable anti-join.
  */
object Sweep {

  /** numpy.linspace(lo, hi, n) — endpoint inclusive. numpy computes
    * step = (hi-lo)/(n-1), val = lo + i*step, with the last point
    * forced to hi exactly. */
  def linspace(lo: Double, hi: Double, n: Int): Vector[Double] = {
    require(n >= 2, s"linspace needs n>=2, got $n")
    val step = (hi - lo) / (n - 1)
    Vector.tabulate(n)(i => if (i == n - 1) hi else lo + i * step)
  }

  /** Reference points rule (parameters_variation.py:78-84). */
  def pointsFor(delta: Double): Int =
    math.max(math.min((1.0 / delta).toInt, 100), 2)

  /** `np.meshgrid(*lists).T.reshape(-1, k)` row enumeration. Axes from
    * slowest- to fastest-varying: (k, k-1, …, 3, 1, 2); each output row
    * keeps the input parameter order. For k==1 this is just the list. */
  def meshgridT(lists: Seq[Vector[Double]]): Vector[Vector[Double]] = {
    val k = lists.length
    require(k >= 1)
    if (k == 1) return lists.head.map(Vector(_))
    // enumeration axis order, slowest first
    val axisOrder: Seq[Int] = ((k - 1) to 2 by -1) ++ Seq(0, 1)
    val combos = axisOrder.foldLeft(Vector(Vector.empty[(Int, Double)])) { (acc, axis) =>
      acc.flatMap(prefix => lists(axis).map(v => prefix :+ (axis -> v)))
    }
    combos.map { combo =>
      val byAxis = combo.toMap
      Vector.tabulate(k)(byAxis)
    }
  }

  /** One sweep variant: ordered param values + identity. */
  final case class Variant(simId: Int, simHash: String, params: Map[String, Any])

  /** Generate all variations of `varied` params (others fixed), matching
    * reference ordering and hashing. `base` is the full Fluid dict. */
  def generateVariations(
      base: Map[String, Any],
      varied: Seq[String],
      delta: Double): Vector[Variant] = {
    if (delta == 0.0 || varied.isEmpty) {
      return Vector(Variant(1, PyJson.paramHash(base), base))
    }
    val lists = varied.map { p =>
      val b = base(p).asInstanceOf[Double]
      val (lo, hi) = Config.variationRange(p, b, delta)
      linspace(lo, hi, pointsFor(delta))
    }
    meshgridT(lists).zipWithIndex.map { case (vals, i) =>
      val params = base ++ varied.zip(vals).toMap
      Variant(i + 1, PyJson.paramHash(params), params)
    }
  }

  /** Variants as a DataFrame seed for the distributed pipeline:
    * (sim_id, sim_hash, param columns...). */
  def variantsDF(spark: SparkSession, variants: Seq[Variant]): DataFrame = {
    import spark.implicits._
    val paramKeys = variants.headOption
      .map(_.params.keys.toSeq.sorted).getOrElse(Seq.empty)
    val rows = variants.map { v =>
      (v.simId, v.simHash,
        paramKeys.map(k => v.params(k) match {
          case d: Double => d
          case other     => other.toString.toDouble
        }))
    }
    rows.toDF("sim_id", "sim_hash", "values")
      .select(
        col("sim_id") +: col("sim_hash") +:
          paramKeys.zipWithIndex.map { case (k, i) =>
            col("values").getItem(i).as(k)
          }: _*)
  }
}
