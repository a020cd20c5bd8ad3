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

  /** Publish a local artifact under the consolidated key layout through
    * the Hadoop FileSystem API — the boto3 `upload_file` analog
    * (/root/reference/src/pumle/cloud_storage.py:104-146), but
    * scheme-agnostic: `bucketRoot` may be `s3a://bucket` (with
    * hadoop-aws on the cluster), `hdfs://…`, or `file:///…` (tests).
    * Returns the destination URI. */
  def publish(spark: org.apache.spark.sql.SparkSession, srcPath: String,
      bucketRoot: String): String = {
    import org.apache.hadoop.fs.{FileUtil, Path => HPath}
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new java.io.File(srcPath)
    require(src.isFile, s"not a file: $srcPath")
    val dst = new HPath(s"$bucketRoot/${goldenKey(src.getName)}")
    val fs = dst.getFileSystem(conf)
    fs.mkdirs(dst.getParent)
    FileUtil.copy(src, fs, dst, false, conf)
    dst.toString
  }

  /** Download a published artifact back to a local file — the
    * `download_file` analog (cloud_storage.py:148-175). */
  def fetch(spark: org.apache.spark.sql.SparkSession, bucketRoot: String,
      fileName: String, localPath: String): String = {
    import org.apache.hadoop.fs.{FileUtil, Path => HPath}
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new HPath(s"$bucketRoot/${goldenKey(fileName)}")
    val fs = src.getFileSystem(conf)
    require(fs.exists(src), s"no such object: $src")
    FileUtil.copy(fs, src, new java.io.File(localPath), false, conf)
    localPath
  }

  /** List published artifacts under the consolidated prefix — the
    * `list_files` analog (cloud_storage.py:177-199). Returns key paths
    * relative to the bucket root. */
  def list(spark: org.apache.spark.sql.SparkSession,
      bucketRoot: String): Seq[String] = {
    import org.apache.hadoop.fs.{Path => HPath}
    val root = new HPath(s"$bucketRoot/consolidated")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val it = fs.listFiles(root, true)
    val b = Seq.newBuilder[String]
    val prefix = fs.makeQualified(new HPath(bucketRoot)).toString.stripSuffix("/") + "/"
    while (it.hasNext) b += it.next().getPath.toString.stripPrefix(prefix)
    b.result().sorted
  }
}
