package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder-prompt north star): image/audio/
  * video as opaque `binary` columns + typed metadata structs, with
  * decode / feature-extract / resize / frame-sample as BATCHED
  * per-partition transforms — the Scala analog of `mapInPandas`
  * (vectorized UDF plumbing) with the actual codec STUBBED (this
  * container ships no image/audio libraries; the stub is deterministic
  * so tests pin the plumbing end to end).
  *
  * Scale design: media bytes never leave the executor (mapPartitions),
  * batches amortize per-call overhead exactly like Arrow batches do for
  * Pandas UDFs, and metadata-only queries never touch the binary column
  * (columnar parquet prunes it at the scan).
  */
object Multimodal {

  /** Typed media row: opaque payload + metadata. */
  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, n_frames: Int)

  final case class Features(
      media_id: Long, kind: String, n_bytes: Int,
      sha256: String, width: Int, height: Int,
      features: Array[Float])

  /** Wrap a source table's binary column into the media schema. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(payloadCol).cast("binary").as("payload"))
      .withColumn("width", (pmod(crc32(col("payload")), lit(64)) + 32).cast("int"))
      .withColumn("height", (pmod(crc32(reverse(col("payload"))), lit(64)) + 32).cast("int"))
      .withColumn("n_frames", lit(1).cast("int"))

  /** THE CODEC CONTRACT: the one boundary a real deployment replaces.
    * Implementations must be Serializable (shipped inside the task
    * closure) and thread-safe per `open()`ed instance. `open()` runs
    * once per batch on the executor — the place to initialize a native
    * codec (JNI/ffi) — and the returned function decodes one payload to
    * a fixed-`dim` feature vector. Everything around it (batching,
    * schema, partition flow, binary-column pruning) is engine code and
    * identical for any decoder. */
  trait Decoder extends Serializable {
    def dim: Int
    def open(): Array[Byte] => Array[Float]
  }

  /** STUB DECODER — stands in for an image/audio codec (this container
    * ships no media libraries). Deterministic: folds payload bytes into
    * `dim` float accumulators, so specs pin the plumbing end to end. */
  final case class StubDecoder(dim: Int = 8) extends Decoder {
    def open(): Array[Byte] => Array[Float] = payload => {
      val acc = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        acc(i % dim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      acc
    }
  }

  /** Batched feature extraction: one pass per partition, `batchSize`
    * rows decoded per inner batch (the mapInPandas batch analog), codec
    * opened once per batch via `decoder.open()`. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      decoder: Decoder = StubDecoder(), batchSize: Int = 256): Dataset[Features] = {
    import spark.implicits._
    media.select("media_id", "kind", "payload", "width", "height")
      .as[(Long, String, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val decode = decoder.open() // codec init once per batch
          batch.iterator.map { case (id, kind, payload, w, h) =>
            val sha = java.security.MessageDigest.getInstance("SHA-256")
              .digest(payload).map("%02x".format(_)).mkString
            Features(id, kind, payload.length, sha, w, h, decode(payload))
          }
        }
      }
  }

  /** "Resize": deterministic payload down-sampling (every k-th byte) —
    * the shape of a real resize kernel without the codec. */
  def resample(spark: SparkSession, media: DataFrame, stride: Int): DataFrame = {
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        (id, p.indices.collect { case i if i % stride == 0 => p(i) }.toArray)
      })
      .toDF("media_id", "payload_small")
  }

  /** Metadata-only projection — must prune the binary column at the
    * parquet scan (assert via .explain: ReadSchema excludes payload). */
  def metaOnly(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"), col("width"), col("height"))
}
