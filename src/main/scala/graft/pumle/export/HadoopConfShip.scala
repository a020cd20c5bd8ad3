package graft.pumle.export

import org.apache.hadoop.conf.Configuration

/** Ships the driver's Hadoop configuration into task closures as plain
  * key-value pairs (Spark's SerializableConfiguration is
  * private[spark]). The session conf carries `spark.hadoop.*` overrides
  * — s3a credentials, HA namenode services — that a bare
  * `new Configuration()` built on an executor would silently drop,
  * breaking any scheme beyond `file://`. */
object HadoopConfShip {

  def entries(conf: Configuration): Array[(String, String)] = {
    val it = conf.iterator()
    val b = Array.newBuilder[(String, String)]
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    b.result()
  }

  def rebuild(entries: Array[(String, String)]): Configuration = {
    val c = new Configuration()
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }
}
