package graft.pumle.export

/** S3 publication layout (OP-S9) — the key scheme the reference uploads
  * golden artifacts under (`consolidated/<stem>/<name>`,
  * /root/reference/src/pumle/arrays.py:280-292). The transfer itself is
  * `df.write.parquet("s3a://…")` / hadoop-aws (no egress in this
  * environment, so only the layout logic is engine code).
  */
object S3Layout {

  /** Key for one golden artifact: `consolidated/<stem>/<fileName>`
    * where stem is the artifact file name without extension
    * (arrays.py:286-288). */
  def goldenKey(fileName: String): String = {
    val stem = fileName.lastIndexOf('.') match {
      case -1 => fileName
      case i  => fileName.substring(0, i)
    }
    s"consolidated/$stem/$fileName"
  }

  /** Full object URI for a bucket. */
  def uri(bucket: String, fileName: String): String =
    s"s3a://$bucket/${goldenKey(fileName)}"
}
