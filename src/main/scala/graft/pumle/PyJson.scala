package graft.pumle

import java.security.MessageDigest

/** Byte-identical re-implementation of the reference's parameter
  * canonicalization (OP-X1/X2/O1):
  *
  *  - `canonicalJson` ≡ Python `json.dumps(d, sort_keys=True)`
  *    (ref /root/reference/src/pumle/utils.py:73) — including CPython's
  *    shortest-round-trip float repr and its fixed/scientific threshold;
  *  - `paramHash` ≡ md5 of that, first 8 hex chars (utils.py:52-81);
  *  - `filenameString` ≡ sorted `key_value` parts with floats as `%.2e`,
  *    `.`→`p`, `+`→``, `-`→`m` (utils.py:200-242).
  *
  * Hash stability is a correctness contract (staging dir names, golden
  * file names, catalog keys) — pinned by the Python-generated oracle
  * vectors in src/test/resources/hash_oracle.json.
  */
object PyJson {

  /** CPython `repr(float)`: shortest round-trip digits; scientific
    * notation iff decimal exponent < -4 or >= 16; exponent always
    * signed with at least two digits; fixed form always keeps a
    * fractional part (`35.0`).
    */
  def pyFloatRepr(v: Double): String = {
    if (v.isNaN) return "NaN" // json.dumps default allow_nan=True spelling
    if (v.isPosInfinity) return "Infinity"
    if (v.isNegInfinity) return "-Infinity"
    if (v == 0.0) return if (1.0 / v < 0) "-0.0" else "0.0"
    val neg = v < 0
    val abs = math.abs(v)
    // Shortest correctly-rounded digits (CPython repr = dtoa mode 0).
    // JDK 17's Double.toString is NOT always shortest (e.g. subnormals:
    // "4.9E-324" where Python emits "5e-324"), so search the minimal
    // precision whose HALF_EVEN rounding round-trips.
    val exact = new java.math.BigDecimal(abs)
    val short = (1 to 17).iterator
      .map(p => exact.round(new java.math.MathContext(p, java.math.RoundingMode.HALF_EVEN)))
      .find(_.doubleValue() == abs)
      .getOrElse(exact)
      .stripTrailingZeros()
    val digits = short.unscaledValue().toString
    val exp10 = short.precision() - 1 - short.scale()
    val n = digits.length
    val sb = new StringBuilder(if (neg) "-" else "")
    if (exp10 < -4 || exp10 >= 16) {
      sb.append(digits.head)
      if (n > 1) sb.append('.').append(digits.tail)
      sb.append('e')
      sb.append(if (exp10 < 0) '-' else '+')
      val ae = math.abs(exp10)
      if (ae < 10) sb.append('0')
      sb.append(ae)
    } else if (exp10 >= 0) {
      if (exp10 >= n - 1) { // integral value: pad zeros, keep ".0"
        sb.append(digits).append("0" * (exp10 - n + 1)).append(".0")
      } else {
        sb.append(digits.substring(0, exp10 + 1)).append('.')
          .append(digits.substring(exp10 + 1))
      }
    } else {
      sb.append("0.").append("0" * (-exp10 - 1)).append(digits)
    }
    sb.toString
  }

  /** json.dumps default escaping: short escapes for the JSON control
    * set (incl. \b and \f), \uXXXX for other controls AND for every
    * non-ASCII char (ensure_ascii=True — astral chars emit surrogate
    * pairs, which per-UTF-16-unit escaping reproduces). */
  private def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\b' => "\\b"
    case '\f' => "\\f"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' || c > '~' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def jsonValue(v: Any): String = v match {
    case d: Double  => pyFloatRepr(d)
    case f: Float   => pyFloatRepr(f.toDouble)
    case i: Int     => i.toString
    case l: Long    => l.toString
    case b: Boolean => if (b) "true" else "false"
    case null       => "null"
    case s: String  => "\"" + jsonEscape(s) + "\""
    case m: Map[_, _] =>
      canonicalJson(m.asInstanceOf[Map[String, Any]])
    case xs: Seq[_] => xs.map(jsonValue).mkString("[", ", ", "]")
    case other => throw new IllegalArgumentException(s"unsupported: $other")
  }

  /** `json.dumps(d, sort_keys=True)` — keys sorted by code point,
    * separators `", "` / `": "`. */
  def canonicalJson(d: Map[String, Any]): String =
    d.toSeq.sortBy(_._1)(Ordering.String)
      .map { case (k, v) => "\"" + jsonEscape(k) + "\": " + jsonValue(v) }
      .mkString("{", ", ", "}")

  def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** First 8 hex chars of md5(canonicalJson) — the sim_hash
    * (utils.py:52-81). */
  def paramHash(params: Map[String, Any]): String =
    md5Hex(canonicalJson(params)).substring(0, 8)

  /** C/Python `printf("%.<prec>e")` semantics: round the EXACT binary
    * value half-even to prec+1 significant digits. Java's Formatter
    * instead rounds the shortest decimal repr HALF_UP (wrong near
    * decimal midpoints, e.g. 1.06499999…e-7 → "1.07e-07") and pads
    * subnormals with zeros — both divergences observed against real
    * oracles. */
  def printfE(v: Double, prec: Int): String = {
    if (v == 0.0 || v.isNaN || v.isInfinite) return s"%.${prec}e".format(v)
    val sig = prec + 1
    val neg = v < 0
    val r = new java.math.BigDecimal(math.abs(v))
      .round(new java.math.MathContext(sig, java.math.RoundingMode.HALF_EVEN))
    val digits = r.unscaledValue().toString.padTo(sig, '0')
    val exp10 = r.precision() - 1 - r.scale()
    val sign = if (neg) "-" else ""
    val esign = if (exp10 < 0) "-" else "+"
    f"$sign${digits.head}.${digits.tail}e$esign${math.abs(exp10)}%02d"
  }

  /** `%.2e`-encoded float for filenames: `.`→`p`, drop `+`, `-`→`m`
    * (utils.py:218-226). */
  def sciEncode(v: Double): String =
    printfE(v, 2).replace(".", "p").replace("+", "").replace("-", "m")

  /** Sorted `key_value` filename string — exact mirror of
    * `params_to_filename_string` (utils.py:200-242): floats `%.2e`
    * sci-encoded; other values via Python str() with space→`_`,
    * `/`→`-`, then stripped to [alnum _ -] (booleans render
    * `True`/`False`); parts are appended whole until the next part
    * would exceed `maxLength` (at least one part always kept). */
  def filenameString(params: Map[String, Any], maxLength: Int = 100): String = {
    val parts = Vector.newBuilder[String]
    var currentLength = 0
    var n = 0
    for ((k, v) <- params.toSeq.sortBy(_._1)(Ordering.String)) {
      val valStr = v match {
        case d: Double => sciEncode(d)
        case f: Float  => sciEncode(f.toDouble)
        case b: Boolean => if (b) "True" else "False"
        case other =>
          other.toString.replace(" ", "_").replace("/", "-")
            .filter(c => c.isLetterOrDigit || c == '_' || c == '-')
      }
      val part = s"${k}_$valStr"
      if (currentLength + part.length + 1 > maxLength && n > 0) {
        return parts.result().mkString("_")
      }
      parts += part
      currentLength += part.length + 1
      n += 1
    }
    val out = parts.result()
    if (out.isEmpty) "no_params" else out.mkString("_")
  }
}
