package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata; decode / feature-extract / frame-sample run as
  * `mapPartitions` over batched rows (the Scala analogue of mapInPandas —
  * one decoder instantiation per partition, not per row).
  *
  * The actual codec step is STUBBED — this container ships no image/audio
  * libraries — with a deterministic fake (byte statistics standing in for
  * pixel decode). Everything around it is real and tested: schema, binary
  * column handling, per-partition batching, partitioning of the feature
  * output.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, media: Array[Byte], mime: String, n_bytes: Long)
  final case class MediaFeatures(media_id: Long, n_bytes: Long, width: Int,
      height: Int, features: Array[Float])

  /** Wrap a text column as a binary media payload with typed metadata
    * (stand-in for reading real image/audio bytes at ingest).
    */
  def attach(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("media"),
      lit("application/octet-stream").as("mime"),
      octet_length(col(textCol)).cast("long").as("n_bytes"))

  /** ===== STUB: decode step =====
    * A real deployment decodes image bytes here (e.g. JPEG → HxWx3). The
    * deterministic fake derives "dimensions" and a 4-dim "feature vector"
    * from byte statistics so tests have stable expectations. The Spark-side
    * shape — mapPartitions, one initialization per partition, typed output —
    * is the real contract.
    */
  private def fakeDecode(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = bytes.length
    val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
    val width = (n % 64) + 1
    val height = (sum % 64L).toInt + 1
    val feats = Array(
      n.toFloat,
      (sum % 251L).toFloat,
      if (n > 0) (bytes(0) & 0xff).toFloat else 0f,
      if (n > 0) (bytes(n - 1) & 0xff).toFloat else 0f)
    (width, height, feats)
  }

  /** Decode + feature-extract over partitions (batch shape: the per-partition
    * iterator — a real decoder would be constructed once per partition here).
    */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.select("media_id", "media", "n_bytes").as(
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY, Encoders.scalaLong))
      .mapPartitions { it =>
        // per-partition init of the (stubbed) decoder happens here
        it.map { case (id, bytes, nb) =>
          val (w, h, f) = fakeDecode(bytes)
          MediaFeatures(id, nb, w, h, f)
        }
      }
  }

  /** Frame sampling for (mock) video payloads: split the binary into
    * fixed-size frames, keep every `stride`-th — pure column ops, no UDF.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      .select(col("media_id"), col("n_bytes"),
        posexplode(
          transform(
            sequence(lit(0), (col("n_bytes") / frameBytes).cast("int")),
            i => substring(col("media"), (i * frameBytes + 1).cast("int"), lit(frameBytes))))
          .as(Seq("frame_idx", "frame")))
      .filter(octet_length(col("frame")) > 0 && pmod(col("frame_idx"), lit(stride)) === 0)
      .select(col("media_id"), col("frame_idx"), octet_length(col("frame")).as("frame_bytes"))
}
