package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata; decode / feature-extract / frame-sample run as
  * `mapPartitions` over batched rows (the Scala analogue of mapInPandas —
  * one decoder instantiation per partition, not per row).
  *
  * The codec layer is a trait with two implementations: [[PgmCodec]] — a REAL
  * decoder for binary PGM (P5) images, header parse + pixel statistics — and
  * [[FakeCodec]], the deterministic byte-statistics stand-in kept for tests
  * (this container ships no JPEG/audio libraries; richer codecs slot in
  * behind the same trait). Everything around the codec is real and tested:
  * schema, binary column handling, per-partition batching, partitioning of
  * the feature output.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, media: Array[Byte], mime: String, n_bytes: Long)

  /** Decoded features: image dimensions + integer pixel statistics
    * (mean in per-mille so the output is integer-exact / oracle-checkable).
    */
  final case class MediaFeatures(media_id: Long, n_bytes: Long, width: Int,
      height: Int, pixel_sum: Long, mean_milli: Long)

  /** A media codec: bytes → (width, height, pixel_sum). Constructed once per
    * partition inside [[decodeFeatures]].
    */
  trait MediaCodec extends Serializable {
    def decode(bytes: Array[Byte]): (Int, Int, Long)
  }

  /** REAL codec: binary PGM (Netpbm P5, 8-bit). Parses the textual header
    * (`P5\n<width> <height>\n<maxval>\n`), then folds the raster — width and
    * height come from the BYTES, not from any side channel.
    */
  object PgmCodec extends MediaCodec {
    def decode(bytes: Array[Byte]): (Int, Int, Long) = {
      require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '5',
        "not a P5 PGM payload")
      var i = 2
      def skipWs(): Unit = { while (i < bytes.length && bytes(i).toChar.isWhitespace) i += 1 }
      def readInt(): Int = {
        skipWs()
        var v = 0
        while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
          v = v * 10 + (bytes(i) - '0'); i += 1
        }
        v
      }
      val width = readInt()
      val height = readInt()
      val maxval = readInt()
      require(maxval == 255, s"only 8-bit PGM supported, got maxval=$maxval")
      i += 1 // single whitespace after maxval, then the raster
      var sum = 0L
      val end = math.min(bytes.length, i + width * height)
      while (i < end) { sum += (bytes(i) & 0xff); i += 1 }
      (width, height, sum)
    }
  }

  /** REAL codec #2: 8-bit uncompressed grayscale BMP (Windows
    * BITMAPINFOHEADER). Parses the binary little-endian header — data
    * offset, dimensions, bit depth — then folds the raster rows, skipping
    * the 4-byte row-stride padding. Everything comes from the BYTES.
    */
  object BmpCodec extends MediaCodec {
    private def le4(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    private def le2(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

    def decode(bytes: Array[Byte]): (Int, Int, Long) = {
      require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
        "not a BMP payload")
      val dataOffset = le4(bytes, 10)
      val width = le4(bytes, 18)
      val height = le4(bytes, 22) // positive = bottom-up; sum is order-free
      val bpp = le2(bytes, 28)
      require(bpp == 8, s"only 8-bit grayscale BMP supported, got bpp=$bpp")
      require(le4(bytes, 30) == 0, "compressed BMP not supported")
      val stride = ((width + 3) / 4) * 4
      var sum = 0L
      var r = 0
      while (r < height) {
        val rowStart = dataOffset + r * stride
        var c = 0
        while (c < width && rowStart + c < bytes.length) {
          sum += (bytes(rowStart + c) & 0xff); c += 1
        }
        r += 1
      }
      (width, height, sum)
    }
  }

  /** REAL codec #3 — the AUDIO class: 16-bit PCM WAV (RIFF). Walks the
    * chunk list (word-aligned per the RIFF spec, unknown chunks skipped),
    * takes channels/bit-depth from the binary little-endian `fmt ` chunk
    * and folds the `data` chunk's int16 samples into a total absolute
    * amplitude. Mapped onto the shared [[MediaCodec]] triple as
    * (channels, frames-per-channel, Σ|sample|) — `decodeFeatures`' mean
    * then reads as mean absolute amplitude per-mille. Everything comes
    * from the BYTES.
    */
  object WavCodec extends MediaCodec {
    private def le4(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    private def le2(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

    def decode(bytes: Array[Byte]): (Int, Int, Long) = {
      require(bytes.length >= 12 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
        "not a RIFF/WAVE payload")
      var i = 12
      var channels = 0
      var fmtSeen = false
      var dataSeen = false
      var nFrames = 0
      var sum = 0L
      while (i + 8 <= bytes.length) {
        val id = new String(bytes, i, 4, "US-ASCII")
        val size = le4(bytes, i + 4)
        val body = i + 8
        // chunk-size validation (ADVICE r05): a corrupt/malicious negative
        // size could leave `i` unchanged (size = -8/-9) and spin this walk
        // forever on an executor, or walk backwards — fail loudly instead.
        // `body + size` is computed in Long so a huge size can't overflow
        // back into range.
        require(size >= 0 && body.toLong + size.toLong <= bytes.length,
          s"corrupt RIFF chunk '$id': size=$size at offset $i " +
            s"(payload ${bytes.length} bytes)")
        id match {
          case "fmt " =>
            require(size >= 16, s"truncated fmt chunk: size=$size")
            require(le2(bytes, body) == 1, "only PCM WAV supported")
            channels = le2(bytes, body + 2)
            require(channels >= 1, "PCM channel count must be >= 1")
            val bps = le2(bytes, body + 14)
            require(bps == 16, s"only 16-bit PCM supported, got bps=$bps")
            fmtSeen = true
          case "data" =>
            require(fmtSeen, "data chunk before fmt chunk")
            val n = math.min(size.toLong, (bytes.length - body).toLong).toInt / 2
            var s = 0
            while (s < n) {
              val v = ((bytes(body + 2 * s) & 0xff) |
                (bytes(body + 2 * s + 1) << 8)).toShort.toInt
              sum += math.abs(v)
              s += 1
            }
            nFrames = n / channels
            dataSeen = true
          case _ => () // LIST/INFO/etc. — skipped, size-driven walk
        }
        i = body + size + (size & 1) // RIFF chunks are word-aligned
      }
      require(dataSeen, "no data chunk")
      (channels, nFrames, sum)
    }
  }

  /** STUB codec kept for tests: deterministic byte statistics standing in for
    * a library decode (JPEG etc.). The Spark-side contract it exercises —
    * mapPartitions, per-partition init, typed output — is identical.
    */
  object FakeCodec extends MediaCodec {
    def decode(bytes: Array[Byte]): (Int, Int, Long) = {
      val n = bytes.length
      val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
      ((n % 64) + 1, (sum % 64L).toInt + 1, sum)
    }
  }

  /** Wrap a text column as a binary media payload with typed metadata
    * (stand-in for reading real image/audio bytes at ingest).
    */
  def attach(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("media"),
      lit("application/octet-stream").as("mime"),
      octet_length(col(textCol)).cast("long").as("n_bytes"))

  /** Render a text column as a REAL binary PGM image (P5): width =
    * (n_bytes mod 16)+1, height = ceil(n_bytes/width) (min 1), raster = the
    * text bytes NUL-padded to width·height. Deterministic, pure column ops —
    * the ingest-side counterpart of [[PgmCodec]]; every derived quantity is
    * SQL-derivable from the text, which is what makes the decode
    * oracle-checkable end to end.
    */
  def attachPgm(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"), col(textCol).as("_t"))
      .withColumn("_n", octet_length(col("_t")).cast("long"))
      .withColumn("_w", pmod(col("_n"), lit(16L)) + 1L)
      .withColumn("_h", greatest(lit(1L),
        ceil(col("_n").cast("double") / col("_w").cast("double")).cast("long")))
      .withColumn("_hdr", concat(lit("P5\n"), col("_w").cast("string"), lit(" "),
        col("_h").cast("string"), lit("\n255\n")))
      .withColumn("_pad", (col("_w") * col("_h") - col("_n")).cast("int"))
      .select(
        col("media_id"),
        // NUL padding to the full raster (chr(0) encodes to a 0 byte)
        encode(concat(col("_hdr"), col("_t"), expr("repeat(chr(0), _pad)")), "UTF-8")
          .as("media"),
        lit("image/x-portable-graymap").as("mime"),
        (octet_length(col("_hdr")) + col("_w") * col("_h")).cast("long").as("n_bytes"))

  private def hexByte(v: Column): Column =
    lpad(hex(v.bitwiseAND(lit(255L))), 2, "0")
  private def le4hex(v: Column): Column =
    concat(hexByte(v), hexByte(shiftright(v, 8)),
      hexByte(shiftright(v, 16)), hexByte(shiftright(v, 24)))

  /** 256-entry grayscale palette (B,G,R,0 per entry), a constant. */
  private val PaletteHex: String =
    (0 until 256).map(i => f"$i%02X$i%02X$i%02X00").mkString

  /** Render a text column as a REAL 8-bit grayscale BMP: width =
    * ((n_bytes mod 4)+1)·4 — always a multiple of 4, so the BMP row stride
    * equals the width and the raster is the text's UTF-8 bytes contiguously,
    * NUL-padded to width·height. The binary little-endian header is built
    * with pure column ops (numbers → little-endian hex → one `unhex`);
    * the ingest-side counterpart of [[BmpCodec]], every derived quantity
    * SQL-derivable from the text (the oracle contract, as with
    * [[attachPgm]]).
    */
  def attachBmp(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"), col(textCol).as("_t"))
      .withColumn("_n", octet_length(col("_t")).cast("long"))
      .withColumn("_w", (pmod(col("_n"), lit(4L)) + 1L) * 4L)
      .withColumn("_h", greatest(lit(1L),
        ceil(col("_n").cast("double") / col("_w").cast("double")).cast("long")))
      .withColumn("_px", col("_w") * col("_h"))
      // BITMAPFILEHEADER(14) + BITMAPINFOHEADER(40) + palette(1024) = 1078
      .withColumn("_hdr", concat(
        lit("424D"), le4hex(col("_px") + 1078L), lit("00000000"), le4hex(lit(1078L)),
        le4hex(lit(40L)), le4hex(col("_w")), le4hex(col("_h")),
        lit("0100"), lit("0800"), // planes = 1, bpp = 8
        le4hex(lit(0L)), le4hex(col("_px")), le4hex(lit(0L)), le4hex(lit(0L)),
        le4hex(lit(256L)), le4hex(lit(0L)), lit(PaletteHex)))
      .select(
        col("media_id"),
        unhex(concat(col("_hdr"), hex(encode(col("_t"), "UTF-8")),
          repeat(lit("00"), (col("_px") - col("_n")).cast("int")))).as("media"),
        lit("image/bmp").as("mime"),
        (col("_px") + 1078L).as("n_bytes"))

  /** Render a text column as a REAL 16-bit PCM mono WAV: each UTF-8 byte of
    * the text becomes one little-endian int16 sample of that value (so the
    * decoded absolute-amplitude sum equals the text's byte sum — the same
    * SQL-derivable quantity the image codecs fold, which is what keeps the
    * decode oracle-checkable end to end). The 44-byte canonical RIFF header
    * is built with pure column ops (numbers → little-endian hex → one
    * `unhex`); the sample rate varies with the text length to exercise the
    * header parse. Ingest-side counterpart of [[WavCodec]].
    */
  def attachWav(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"), col(textCol).as("_t"))
      .withColumn("_n", octet_length(col("_t")).cast("long"))
      .withColumn("_rate", lit(8000L) + pmod(col("_n"), lit(8L)) * 1000L)
      .withColumn("_hdr", concat(
        lit("52494646"), le4hex(col("_n") * 2L + 36L), lit("57415645"), // RIFF size WAVE
        lit("666D7420"), le4hex(lit(16L)), // "fmt " chunk, 16 bytes
        lit("0100"), lit("0100"), // PCM, 1 channel (LE int16s)
        le4hex(col("_rate")), le4hex(col("_rate") * 2L), // sample rate, byte rate
        lit("0200"), lit("1000"), // block align 2, 16 bps
        lit("64617461"), le4hex(col("_n") * 2L))) // "data" chunk, 2n bytes
      .select(
        col("media_id"),
        // one "$1 00" pair per text byte: byte b -> LE int16 sample b
        unhex(concat(col("_hdr"),
          regexp_replace(hex(encode(col("_t"), "UTF-8")), "(..)", "$100"))).as("media"),
        lit("audio/wav").as("mime"),
        (col("_n") * 2L + 44L).as("n_bytes"))

  /** Decode + feature-extract over partitions (batch shape: the per-partition
    * iterator — the codec is constructed/bound once per partition here, the
    * mapInPandas batching contract).
    */
  def decodeFeatures(media: DataFrame, codec: MediaCodec = FakeCodec): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.select("media_id", "media", "n_bytes").as(
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY, Encoders.scalaLong))
      .mapPartitions { it =>
        // per-partition codec binding happens here (one init, many rows)
        val c = codec
        it.map { case (id, bytes, nb) =>
          val (w, h, sum) = c.decode(bytes)
          val px = math.max(1L, w.toLong * h)
          MediaFeatures(id, nb, w, h, sum, sum * 1000L / px)
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
