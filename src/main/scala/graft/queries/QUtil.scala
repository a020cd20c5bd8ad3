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
    * Java and C printf agree on `%.2e` for doubles, so the DuckDB
    * spelling is `replace(replace(replace(printf('%.2e',x),'.','p'),'+',''),'-','m')`. */
  def sciEncode(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(format_string("%.2e", c), "\\.", "p"),
        "\\+", ""),
      "-", "m")
}
