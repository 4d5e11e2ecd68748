package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star, SURVEY.md §2k): media payloads
  * travel as opaque `binary` columns next to a typed metadata struct; all
  * per-item work (decode, feature extraction, frame sampling) runs inside
  * `mapPartitions` so one task touches one batch of payloads and nothing
  * is ever collected to the driver.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB (`fakeDecode` below — byte-derived pseudo
  * width/height/duration). The Spark-side plumbing — schema, binary
  * transport, partitioning, batch iteration, output shape — is real and
  * is what these operators test.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false)))

  /** Wrap a text corpus as fake media rows: payload = UTF-8 bytes,
    * metadata = (type, size, md5). At production scale the payload column
    * would come straight from the lakehouse parquet/Avro ingest. */
  def asMedia(docs: DataFrame, mediaType: String = "image/fake"): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit(mediaType).as("media_type"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        md5(col("text").cast("binary")).as("checksum")).as("meta"))

  /** STUB decode: deterministic pseudo-features from the payload bytes
    * (stands in for a JPEG/PNG decode + embed). */
  private[graft] def fakeDecode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) { h = (h ^ payload(i)) * 0x100000001b3L; i += 1 }
    val w = 64 + (math.abs(h) % 1024).toInt
    val ht = 64 + (math.abs(h >> 10) % 1024).toInt
    val feat = Array.tabulate(8)(j =>
      (((h >>> (j * 8)) & 0xFF).toInt / 255.0f))
    (w, ht, feat)
  }

  /** Decode + feature-extract: one pass per partition, constant memory
    * per row. Output: media_id, width, height, feature vector. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (w, h, feat) = fakeDecode(r.getAs[Array[Byte]](1))
          Row(id, w, h, feat.toSeq)
        }
      }(enc)
  }

  /** Frame sampling: split the payload into fixed-size "frames" and emit
    * every `stride`-th one — the batch shape of video frame extraction.
    * Pure `functions._`: binary slicing stays inside codegen. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = ceil(col("meta.n_bytes").cast("double") / frameBytes)
      .cast("int")
    media.select(
      col("media_id"), col("meta"), col("payload"),
      explode(sequence(lit(0), greatest(nFrames - 1, lit(0)))).as("frame_no"))
      .filter(col("frame_no") % stride === 0)
      .select(
        col("media_id"), col("frame_no"),
        substring(col("payload"), col("frame_no") * frameBytes + 1,
            lit(frameBytes))
          .as("frame_bytes"))
  }
}
