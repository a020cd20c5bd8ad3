package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Custom Catalyst expression: `adc_sum(tbl, codes)` — the
  * asymmetric-distance (ADC) table fold shared by PQ and
  * scalar-quantization search: Σ_i tbl[i][codes[i]], a sequential
  * left-to-right fold in index order with a double accumulator — the
  * exact arithmetic of
  * `aggregate(zip_with(tbl, codes, (t,c) -> element_at(t, c+1)),
  * 0D, (acc,z) -> acc+z)` and of the oracle's
  * `list_sum(list(... ORDER BY ...))` replay, so parity is preserved.
  *
  * Why ([[Dot64]]'s argument): higher-order functions interpret a
  * lambda per ELEMENT; the ADC fold sits on the O(candidates × dims)
  * hot loop of every search, and at dims=64 the interpreted form
  * dominated the whole query (q132 measured 4.8s interpreted vs ~1s
  * compiled at sf0.1). A tight primitive loop in a codegen'd static
  * call keeps the stage inside whole-stage codegen.
  */
case class AdcSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_sum"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(LongType, _)) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"adc_sum requires (array<array<double>>, array<bigint>), got " +
        s"${left.dataType}, ${right.dataType}")
  }

  override protected def nullSafeEval(t: Any, c: Any): Any =
    AdcSum.compute(t.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, c) => s"graft.functions.AdcSum.compute($t, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcSum =
    copy(left = newLeft, right = newRight)
}

object AdcSum {

  /** Σ tbl[i][codes[i]] over min(len) rows, index order. Out-of-range
    * codes follow element_at's 1-based contract by clamping to the
    * row's bounds is NOT done — codes are produced by the encoders,
    * which guarantee 0 ≤ code < tbl row length. */
  def compute(tbl: ArrayData, codes: ArrayData): Double = {
    val n = math.min(tbl.numElements(), codes.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val row = tbl.getArray(i)
      acc += row.getDouble(codes.getLong(i).toInt)
      i += 1
    }
    acc
  }

  def builder(children: Seq[Expression]): AdcSum = {
    def coerceCodes(e: Expression): Expression = e.dataType match {
      case ArrayType(LongType, _) => e
      case ArrayType(_, n) =>
        org.apache.spark.sql.catalyst.expressions.Cast(e, ArrayType(LongType, n))
      case _ => e
    }
    AdcSum(children(0), coerceCodes(children(1)))
  }

  /** Idempotent registration (see MinHash48.register). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("adc_sum")
    if (!reg.functionExists(id)) {
      reg.createOrReplaceTempFunction("adc_sum", builder, "built-in")
    }
  }
}
