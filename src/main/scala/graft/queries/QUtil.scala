package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared column helpers used across query batches.
  *
  * Everything here must have a byte-identical DuckDB spelling (documented
  * per helper) so Spark results and oracle results cannot diverge.
  */
object QUtil {

  /** Order-insensitive sum of a double column: per-term cast to
    * DECIMAL(18,6) (deterministic rounding), exact decimal addition,
    * result back to double. DuckDB spelling:
    * `CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Scientific-notation float encoding used by PUMLE filenames
    * (ref /root/reference/src/pumle/utils.py:218-226): `%.2e` with
    * `.`→`p`, drop `+`, `-`→`m`;  5.0→5p00e00, 4e-05→4p00em05.
    * DuckDB spelling:
    * `replace(replace(replace(printf('%.2e',x),'.','p'),'+',''),'-','m')`.
    *
    * Deliberately a UDF over PyJson.sciEncode, NOT format_string: Java's
    * `%.2e` rounds the shortest decimal repr HALF_UP while C/Python
    * printf round the exact binary value half-even — e.g.
    * 1.06499999…e-7 formats as `1.07e-07` in Java but `1.06e-07` in
    * C/Python (observed as a real sf0.1 oracle mismatch). PyJson does
    * the exact-BigDecimal rounding that matches printf. */
  def sciEncode(c: Column): Column = {
    val f = udf((d: Double) => graft.pumle.PyJson.sciEncode(d))
    f(c)
  }

  /** Exact C/Python `%.6e` (see sciEncode's rationale — Java's
    * format_string rounds differently near decimal midpoints). DuckDB
    * spelling: `printf('%.6e', x)`. */
  def printf6e(c: Column): Column = {
    val f = udf((d: Double) => graft.pumle.PyJson.printfE(d, 6))
    f(c)
  }
}
