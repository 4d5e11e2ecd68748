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
  * Two decode tiers:
  *  - [[asPpm]]/[[decodePpm]] — a REAL codec: spec-conformant binary
  *    PPM (P6) images built from the corpus and decoded back by an
  *    actual netpbm header parser + pixel reader. Integer-only
  *    construction arithmetic makes the bytes reproducible by a SQL
  *    oracle (dimensions + pixel MD5 hash-checked against DuckDB).
  *  - [[decodeFeatures]] — the stand-in for codecs the container lacks
  *    (JPEG/PNG/audio): a DETERMINISTIC STUB (`fakeDecode`) behind the
  *    same mapPartitions plumbing a real decoder would use.
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

  // ===== real decode: binary PPM (P6) =====
  //
  // The sandbox has no JPEG/PNG codecs, but PPM is a complete,
  // JVM-decodable raster format — so the decode step can be REAL:
  // construct spec-conformant P6 images, then parse them back with an
  // actual header parser + pixel-section reader. The construction
  // arithmetic is integer-only, so a SQL oracle can rebuild the exact
  // bytes and recompute the checksum.

  /** Wrap a text corpus as real binary-PPM (P6) images: header
    * `P6\n<w> <h>\n255\n`, pixel section = the UTF-8 text bytes
    * zero-padded to exactly `3*w*h`. Dimensions derive from the byte
    * count by integer arithmetic only (`w = 1 + n%37`,
    * `h = ceil(n/(3w))`), so they are reproducible anywhere. */
  def asPpm(docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = Encoders.row(outSchema)
    docs.select(col("doc_id").as("media_id"),
        coalesce(col("text"), lit("")).as("text"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val tb = r.getString(1)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val n = tb.length
          val w = 1 + (n % 37)
          val h = (n + 3 * w - 1) / (3 * w)
          val header = s"P6\n$w $h\n255\n"
            .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          val payload = new Array[Byte](header.length + 3 * w * h)
          System.arraycopy(header, 0, payload, 0, header.length)
          System.arraycopy(tb, 0, payload, header.length, n)
          Row(id, payload) // trailing pad bytes stay zero
        }
      }(enc)
  }

  /** REAL P6 decode: parse the netpbm header (magic, whitespace- and
    * comment-tolerant dimension/maxval tokens), locate the pixel
    * section, and report dimensions + pixel byte count + an MD5 of the
    * pixel bytes. One pass per partition, constant memory per row —
    * the same mapPartitions batch shape a JPEG decode would use. */
  def decodePpm(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("maxval", IntegerType, nullable = false),
      StructField("pix_bytes", LongType, nullable = false),
      StructField("pixel_md5", StringType, nullable = false)))
    val enc = Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, maxval, pixelOff) = parsePpmHeader(bytes)
          val pixLen = bytes.length - pixelOff
          if (pixLen != 3 * w * h) {
            throw new IllegalArgumentException(
              s"PPM media $id: pixel section has $pixLen bytes, " +
              s"header promises ${3 * w * h}")
          }
          // checksum = MD5 of the UPPERCASE-HEX rendering of the pixel
          // bytes (not the raw bytes): byte-identical to DuckDB 1.0's
          // `md5(hex(pixels))`, whose md5 takes VARCHAR only
          val hexChars = new Array[Byte](pixLen * 2)
          val digits = "0123456789ABCDEF"
          var k = 0
          while (k < pixLen) {
            val v = bytes(pixelOff + k) & 0xFF
            hexChars(2 * k) = digits.charAt(v >> 4).toByte
            hexChars(2 * k + 1) = digits.charAt(v & 0xF).toByte
            k += 1
          }
          md.reset()
          md.update(hexChars)
          val hex = md.digest().map(b => f"$b%02x").mkString
          Row(id, w, h, maxval, pixLen.toLong, hex)
        }
      }(enc)
  }

  /** netpbm P6 header parser: magic, then three whitespace-separated
    * ASCII integers (width, height, maxval) with `#` comments allowed,
    * then EXACTLY ONE whitespace byte before the pixel section.
    * Returns (width, height, maxval, pixelSectionOffset). */
  private[graft] def parsePpmHeader(b: Array[Byte]): (Int, Int, Int, Int) = {
    var i = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"not a P6 PPM: $msg")
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') fail("bad magic")
    i = 2
    def isWs(c: Byte): Boolean =
      c == ' ' || c == '\n' || c == '\r' || c == '\t'
    def token(): Int = {
      // skip whitespace and '#' comments (to end of line)
      var skipping = true
      while (skipping) {
        if (i >= b.length) fail("truncated header")
        if (isWs(b(i))) i += 1
        else if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else skipping = false
      }
      var v = 0L
      var any = false
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0'); any = true; i += 1
        if (v > Int.MaxValue) fail("dimension overflow")
      }
      if (!any) fail(s"expected integer at offset $i")
      v.toInt
    }
    val w = token(); val h = token(); val maxval = token()
    if (i >= b.length || !isWs(b(i))) fail("missing pixel separator")
    i += 1 // exactly one whitespace byte, per spec
    if (maxval <= 0 || maxval > 255) fail(s"unsupported maxval $maxval")
    (w, h, maxval, i)
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
