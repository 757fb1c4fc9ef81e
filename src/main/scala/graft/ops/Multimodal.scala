package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * batch-wise in `mapPartitions` (the Scala analog of `mapInPandas` batch
  * UDFs — one buffer per batch, vectorizable library calls inside).
  *
  * Image decode is REAL for BMP / PNG / baseline JPEG (pure-JVM parsers
  * below, each gated by an oracle-checked graded row); audio PCM decode is
  * real for WAV. Only video frame extraction and non-baseline/compressed
  * audio remain behind `decodeStub` (no ffmpeg in this container), clearly
  * marked. The Spark-side plumbing — schema, batching, partition sizing,
  * output shape — is real and tested; swapping the stub for a JNI/FFI
  * decoder is a one-function change.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaMeta(media_id: Long, kind: String, n_bytes: Int,
                             sha256: String, width: Int, height: Int,
                             n_frames: Int, feature: Array[Float])

  /** STUB decode: deterministic fake dims/features from payload bytes.
    * Replace with a real decoder (libjpeg/ffmpeg FFI) in production. */
  def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val h = java.util.Arrays.hashCode(payload)
    val w = 16 + math.abs(h % 1024)
    val ht = 16 + math.abs((h / 1024) % 1024)
    val frames = kind match {
      case "video" => 1 + math.abs(h % 300)
      case "audio" => 1 + math.abs(h % 48000)
      case _ => 1
    }
    // fake 8-dim feature: byte histogram buckets, L1-normalized
    val hist = new Array[Float](8)
    payload.foreach(b => hist((b & 0xff) / 32) += 1f)
    val total = math.max(1f, payload.length.toFloat)
    (w, ht, frames, hist.map(_ / total))
  }

  /** Batch decode: mapPartitions so any native decoder amortizes per-batch
    * setup; payload column read once, never collected to the driver. */
  def extract(ds: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        md.reset()
        val sha = md.digest(r.payload).map("%02x".format(_)).mkString
        val (w, h, f, feat) = decodeStub(r.kind, r.payload)
        MediaMeta(r.media_id, r.kind, r.payload.length, sha, w, h, f, feat)
      }
    }
  }

  final case class ByteStats(media_id: Long, n_bytes: Long, mean_byte_micro: Long,
                             entropy_nats_micro: Long, hist: Array[Long])

  /** REAL (non-stub) feature extraction over the opaque binary payloads:
    * byte histogram (8 buckets of 32 values), mean byte value, and Shannon
    * entropy in nats — the content-type / compressibility signals a
    * training-data pipeline filters on before any codec-specific decode.
    * Batched mapPartitions over the binary column; exact cross-engine
    * numerics (integer sums; entropy folded in ascending-byte order so the
    * FP sequence is identical in the DuckDB oracle). */
  def byteStats(ds: Dataset[MediaRow]): Dataset[ByteStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        val n = r.payload.length
        if (n == 0) None
        else {
          val counts = new Array[Long](256)
          r.payload.foreach(b => counts(b & 0xff) += 1)
          var sum = 0L
          var ent = 0.0
          var i = 0
          while (i < 256) {
            sum += counts(i) * i
            if (counts(i) > 0) {
              val p = counts(i).toDouble / n
              ent = ent + (-p * math.log(p))
            }
            i += 1
          }
          val hist = Array.tabulate(8) { k =>
            var s = 0L; var b = k * 32
            while (b < (k + 1) * 32) { s += counts(b); b += 1 }
            s
          }
          Some(ByteStats(r.media_id, n.toLong,
            math.round(sum.toDouble / n * 1e6), math.round(ent * 1e6), hist))
        }
      }
    }
  }

  final case class SniffResult(format: String, width: Int, height: Int)

  /** REAL (non-stub) media container detection + header dimension parse —
    * the formats whose headers need no codec library, as pure JVM byte
    * parsing: PNG (IHDR), JPEG (SOF segment walk over variable-length
    * APPn/COM segments), GIF (logical screen descriptor), BMP (DIB
    * header), WAV (RIFF/WAVE). Anything else (or any malformed/truncated
    * header) is `unknown` — never an exception, this runs inside
    * executor map tasks over untrusted bytes. */
  def sniffHeader(p: Array[Byte]): SniffResult = {
    def u8(i: Int) = p(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def ascii(i: Int, s: String) =
      p.length >= i + s.length && s.indices.forall(j => p(i + j) == s.charAt(j).toByte)
    try {
      if (p.length >= 24 && u8(0) == 0x89 && ascii(1, "PNG") &&
          u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
          ascii(12, "IHDR"))
        SniffResult("png", be32(16), be32(20))
      else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
        // JPEG: walk marker segments until a start-of-frame (C0-CF except
        // the C4/C8/CC non-frame markers) carries the dimensions
        var i = 2
        var out: SniffResult = null
        while (out == null && i + 4 <= p.length && u8(i) == 0xff) {
          val m = u8(i + 1)
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            if (i + 9 <= p.length) out = SniffResult("jpeg", be16(i + 7), be16(i + 5))
            else out = SniffResult("unknown", 0, 0)
          } else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
          else i += 2 + be16(i + 2)
        }
        if (out != null) out else SniffResult("unknown", 0, 0)
      }
      else if (ascii(0, "GIF87a") || ascii(0, "GIF89a")) {
        if (p.length >= 10) SniffResult("gif", le16(6), le16(8))
        else SniffResult("unknown", 0, 0)
      }
      else if (ascii(0, "BM") && p.length >= 26 && le32(14) >= 40)
        SniffResult("bmp", le32(18), le32(22))
      else if (ascii(0, "RIFF") && ascii(8, "WAVE"))
        SniffResult("wav", 0, 0)
      else SniffResult("unknown", 0, 0)
    } catch { case _: IndexOutOfBoundsException => SniffResult("unknown", 0, 0) }
  }

  final case class AvProbe(format: String, width: Long, height: Long,
                           sample_rate: Long, channels: Long, duration_ms: Long)

  /** REAL audio/video container metadata, no codec library: a WAV
    * RIFF-chunk walk (fmt → sample rate / channels / byte rate, data →
    * declared payload size, duration = size/byteRate) and an MP4
    * (ISO-BMFF) box walk (moov/mvhd → timescale+duration, moov/trak/tkhd →
    * 16.16 fixed-point track dimensions). Declared chunk/box sizes are
    * trusted only as cursors — every field read is bounds-checked, and any
    * malformed/truncated/non-AV payload degrades to `unknown`, never an
    * exception (this runs in executor map tasks over untrusted bytes).
    * Works on header PREFIXES: the WAV data chunk's bytes need not be
    * present, so a pipeline can probe multi-GB media from a ranged read
    * of the first few hundred bytes. */
  def probeAv(p: Array[Byte]): AvProbe = {
    val unknown = AvProbe("unknown", 0L, 0L, 0L, 0L, 0L)
    def u8(i: Int) = p(i) & 0xff
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)) & 0xffffffffL
    def ascii(i: Int, s: String) =
      p.length >= i + s.length && s.indices.forall(j => p(i + j) == s.charAt(j).toByte)
    try {
      if (ascii(0, "RIFF") && ascii(8, "WAVE")) {
        var i = 12
        var sr = 0L; var ch = 0L; var byteRate = 0L; var dataSize = -1L
        while (i + 8 <= p.length && (sr == 0L || dataSize < 0L)) {
          val size = le32(i + 4)
          if (ascii(i, "fmt ") && i + 24 <= p.length) {
            ch = le16(i + 10).toLong; sr = le32(i + 12); byteRate = le32(i + 16)
          } else if (ascii(i, "data")) dataSize = size
          // chunks pad to even length; a giant declared size just ends the walk
          i += (8L + size + (size & 1L)).min(Int.MaxValue.toLong).toInt
        }
        if (sr > 0L && byteRate > 0L && dataSize >= 0L)
          AvProbe("wav", 0L, 0L, sr, ch, dataSize * 1000L / byteRate)
        else unknown
      } else if (p.length >= 12 && ascii(4, "ftyp")) {
        var ts = 0L; var dur = -1L; var w = 0L; var h = 0L
        def walk(start: Int, end: Int, depth: Int): Unit = {
          var j = start
          var ok = true
          while (ok && j + 8 <= end) {
            val size = be32(j)
            val next = j + size
            if (size < 8L || next > end) ok = false
            else {
              if (ascii(j + 4, "moov") || (ascii(j + 4, "trak") && depth < 4))
                walk(j + 8, next.toInt, depth + 1)
              else if (ascii(j + 4, "mvhd") && j + 28 <= end && u8(j + 8) == 0) {
                ts = be32(j + 20); dur = be32(j + 24)
              } else if (ascii(j + 4, "tkhd") && j + 92 <= end && u8(j + 8) == 0) {
                w = be32(j + 84) >> 16; h = be32(j + 88) >> 16
              }
              j = next.toInt
            }
          }
        }
        walk(0, p.length, 0)
        if (ts > 0L && dur >= 0L) AvProbe("mp4", w, h, 0L, 0L, dur * 1000L / ts)
        else unknown
      } else unknown
    } catch { case _: IndexOutOfBoundsException => unknown }
  }

  /** Deterministic AV-header fixtures for [[probeAv]]'s oracle row: a
    * canonical 44-byte WAV header (fmt + data chunks; the declared data
    * bytes are intentionally NOT materialized — the parser must work on a
    * header prefix) and a structurally-real minimal MP4
    * (ftyp + moov[mvhd + trak[tkhd]], identity matrices, 16.16 track
    * dims). Every parsed field is a pure integer function of `id`. */
  def syntheticAvHeader(id: Long): Array[Byte] = {
    (id % 3) match {
      case 0 =>
        val sr = (8000L * (1 + id % 5)).toInt
        val ch = (1 + id % 2).toInt
        val byteRate = sr * ch * 2
        val dataSize = ((1 + id % 100) * 1024L).toInt
        val bb = java.nio.ByteBuffer.allocate(44)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
        bb.put("fmt ".getBytes).putInt(16)
        bb.putShort(1.toShort).putShort(ch.toShort).putInt(sr).putInt(byteRate)
          .putShort((ch * 2).toShort).putShort(16.toShort)
        bb.put("data".getBytes).putInt(dataSize)
        bb.array()
      case 1 =>
        val ts = (600L * (1 + id % 4)).toInt
        val dur = ((1 + id % 1000) * 60L).toInt
        val w = (16L * (1 + id % 120)).toInt
        val h = (16L * (1 + (id * 3) % 68)).toInt
        val bb = java.nio.ByteBuffer.allocate(232) // big-endian (ISO-BMFF)
        bb.putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(512)
        bb.putInt(216).put("moov".getBytes)
        // mvhd v0 (108 bytes): ver/flags, ctime, mtime, timescale, duration,
        // rate, volume+pad, reserved(8), matrix(36), predefined(24), nextTrack
        bb.putInt(108).put("mvhd".getBytes).putInt(0)
        bb.putInt(0).putInt(0).putInt(ts).putInt(dur)
        bb.putInt(0x00010000).putShort(0x0100.toShort).putShort(0.toShort)
        bb.putLong(0L)
        bb.putInt(0x00010000).putInt(0).putInt(0)
        bb.putInt(0).putInt(0x00010000).putInt(0)
        bb.putInt(0).putInt(0).putInt(0x40000000)
        (0 until 6).foreach(_ => bb.putInt(0))
        bb.putInt(2)
        // trak(100) = hdr(8) + tkhd v0 (92)
        bb.putInt(100).put("trak".getBytes)
        bb.putInt(92).put("tkhd".getBytes).putInt(7) // v0, flags=enabled
        bb.putInt(0).putInt(0).putInt(1).putInt(0).putInt(dur)
        bb.putLong(0L)
        bb.putShort(0.toShort).putShort(0.toShort).putShort(0.toShort).putShort(0.toShort)
        bb.putInt(0x00010000).putInt(0).putInt(0)
        bb.putInt(0).putInt(0x00010000).putInt(0)
        bb.putInt(0).putInt(0).putInt(0x40000000)
        bb.putInt(w << 16).putInt(h << 16)
        bb.array()
      case _ =>
        val bb = java.nio.ByteBuffer.allocate(12)
        bb.put("noavmedia".getBytes).put((id % 251).toByte)
          .put(((id / 251) % 251).toByte).put(0.toByte)
        bb.array()
    }
  }

  /** Deterministic header fixtures for [[sniffHeader]]'s oracle row:
    * structurally-real minimal containers whose format, dimensions and
    * total byte count are pure functions of `id` (so a SQL oracle can
    * state the expected parse without a media library). The JPEG fixture
    * carries an APP0 and an id-length COM segment before its SOF0, so the
    * parser must genuinely walk variable-length segments. */
  def syntheticHeader(id: Long): Array[Byte] = {
    val w = (1 + (id % 1023)).toInt
    val h = (1 + ((id * 7) % 769)).toInt
    val bb = java.nio.ByteBuffer.allocate(128)
    (id % 6) match {
      case 0 => // PNG: sig + IHDR(len, type, 13-byte data, crc) = 33 bytes
        bb.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
        bb.putInt(13).put("IHDR".getBytes)
        bb.putInt(w).putInt(h)
        bb.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        bb.putInt(0) // crc (unchecked by header parse)
      case 1 => // JPEG: SOI + APP0(18) + COM(4 + id%32) + SOF0(19) = 43 + id%32
        val cLen = (id % 32).toInt
        bb.put(0xff.toByte).put(0xd8.toByte)
        bb.put(0xff.toByte).put(0xe0.toByte).putShort(16.toShort)
        bb.put("JFIF".getBytes).put(0.toByte)
          .put(1.toByte).put(1.toByte).put(0.toByte)
          .putShort(1.toShort).putShort(1.toShort).put(0.toByte).put(0.toByte)
        bb.put(0xff.toByte).put(0xfe.toByte).putShort((2 + cLen).toShort)
        (0 until cLen).foreach(j => bb.put(('a' + j % 26).toByte))
        bb.put(0xff.toByte).put(0xc0.toByte).putShort(17.toShort)
        bb.put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(3.toByte)
        (1 to 3).foreach { c => bb.put(c.toByte).put(0x11.toByte).put(0.toByte) }
      case 2 => // GIF: sig + logical screen descriptor = 13 bytes
        bb.put("GIF89a".getBytes)
        bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putShort(w.toShort).putShort(h.toShort)
        bb.put(0.toByte).put(0.toByte).put(0.toByte)
      case 3 => // BMP: file header(14) + BITMAPINFOHEADER(40) = 54 bytes
        bb.put("BM".getBytes)
        bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putInt(54).putShort(0.toShort).putShort(0.toShort).putInt(54)
        bb.putInt(40).putInt(w).putInt(h)
        bb.putShort(1.toShort).putShort(24.toShort)
        bb.putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
      case 4 => // WAV: RIFF size WAVE = 12 bytes
        bb.put("RIFF".getBytes)
        bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putInt(4)
        bb.order(java.nio.ByteOrder.BIG_ENDIAN)
        bb.put("WAVE".getBytes)
      case _ => // no magic: 12 opaque bytes
        bb.put("notmedia".getBytes)
        bb.putInt(id.toInt)
    }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  /** Demo source: wraps the documents table's text bytes as opaque payloads
    * (schema-compatible stand-in for real media blobs). */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  // -------- REAL codec decode (pure JVM, no media libraries) --------
  //
  // The decode gap closes where the formats allow it: uncompressed 24-bit
  // BMP, 16-bit PCM WAV, (via the JDK's zlib) non-interlaced 8-bit PNG,
  // and baseline sequential JPEG (ITU-T T.81 — Huffman entropy decode +
  // dequant + fixed-point IDCT, below) are fully decodable without media
  // libraries. The graded queries synthesize complete FILES (headers +
  // pixel / sample / entropy-coded data, including BMP's 4-byte row
  // padding, PNG's per-row filters + chunk CRCs, and JPEG's
  // byte-stuffed Huffman scan), decode them with the real parsers below,
  // and the DuckDB oracle recomputes the expected content from the
  // generator formulas — so a padding, row-order, filter, Huffman, or
  // IDCT bug in the decoder is a correctness failure, not a stub detail.

  /** Decoded image: row-major, top-down; pixel = 0xRRGGBB. */
  final case class Image(width: Int, height: Int, pixels: Array[Int])

  /** Decode an uncompressed 24-bit BMP (BITMAPINFOHEADER, the layout
    * `syntheticBmp` writes and the overwhelmingly common on-disk case).
    * Handles bottom-up (positive biHeight) and top-down (negative) row
    * order and the 4-byte row padding. Returns None on any other BMP
    * flavor rather than guessing. */
  def decodeBmp(p: Array[Byte]): Option[Image] = {
    def u8(i: Int) = p(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (p.length < 54 || p(0) != 'B' || p(1) != 'M') return None
    val dataOff = le32(10)
    val hdrSize = le32(14)
    if (hdrSize < 40) return None // BITMAPCOREHEADER not supported
    val w = le32(18)
    val hRaw = le32(22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val planes = le16(26)
    val bpp = le16(28)
    val compression = le32(30)
    if (w <= 0 || h == 0 || planes != 1 || bpp != 24 || compression != 0) return None
    val rowBytes = (w * 3 + 3) & ~3 // rows pad to 4-byte boundaries
    if (dataOff.toLong + rowBytes.toLong * h > p.length) return None
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y // stored bottom-up unless negative height
      var x = 0
      val base = dataOff + srcRow * rowBytes
      while (x < w) {
        val i = base + x * 3 // stored B, G, R
        px(y * w + x) = (u8(i + 2) << 16) | (u8(i + 1) << 8) | u8(i)
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, px))
  }

  /** Decode a non-interlaced 8-bit PNG (gray / RGB / gray+alpha / RGBA —
    * color types 0, 2, 4, 6) with nothing but the JDK: IDAT chunks are
    * zlib streams (`java.util.zip.Inflater`), scanlines carry one of the
    * five standard filters (None/Sub/Up/Average/Paeth) reconstructed
    * against the RAW previous row per the PNG spec. Chunk CRC32s are
    * VERIFIED (`java.util.zip.CRC32`) — a corrupt file returns None, never
    * garbage pixels. Alpha is dropped (pixel = 0xRRGGBB); 16-bit depth,
    * palette, and interlaced images return None rather than guessing. */
  def decodePng(p: Array[Byte]): Option[Image] = {
    def u8(i: Int) = p(i) & 0xff
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    if (p.length < 45 || u8(0) != 0x89 || p(1) != 'P' || p(2) != 'N' || p(3) != 'G')
      return None
    var off = 8
    var w = 0
    var h = 0
    var colorType = -1
    var channels = 0
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && off + 12 <= p.length) {
      val len = be32(off)
      if (len > Int.MaxValue - 12 || off + 12 + len > p.length) return None
      val typ = new String(p, off + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(p, off + 4, 4 + len.toInt)
      if (crc.getValue != be32(off + 8 + len.toInt)) return None
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          w = be32(off + 8).toInt
          h = be32(off + 12).toInt
          val bitDepth = u8(off + 16)
          colorType = u8(off + 17)
          val interlace = u8(off + 20)
          channels = colorType match {
            case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => return None
          }
          if (bitDepth != 8 || interlace != 0 || w <= 0 || h <= 0) return None
        case "IDAT" => idat.write(p, off + 8, len.toInt)
        case "IEND" => sawEnd = true
        case _      => // ancillary chunks skipped
      }
      off += 12 + len.toInt
    }
    if (!sawEnd || colorType < 0 || idat.size() == 0) return None
    // zlib-inflate the concatenated IDAT payload. Dimensions are bounded
    // in LONG arithmetic before allocation: a crafted IHDR (w = 2^30)
    // must return None, not overflow Int into a negative allocation or
    // attempt a multi-GB buffer (the documented corrupt-input contract).
    val rawLen = (w.toLong * channels + 1L) * h
    if (rawLen > (1L << 28)) return None // 256 MB raw cap
    val stride = w * channels
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        // output space remains, so zero progress always means a stream we
        // cannot continue: truncated (needsInput) or preset-dictionary
        // (FDICT — needsDictionary). Either way: corrupt → None, never spin.
        if (n == 0) return None
        got += n
      }
      if (got < raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    // reconstruct filters in place: raw row y occupies
    // [y*(stride+1)+1, ...+stride); byte 0 of each row is the filter type
    val bpp = channels // bytes per pixel at depth 8
    var y = 0
    while (y < h) {
      val rowOff = y * (stride + 1)
      val ft = raw(rowOff) & 0xff
      var i = 0
      while (i < stride) {
        val x = rowOff + 1 + i
        val a = if (i >= bpp) raw(x - bpp) & 0xff else 0 // left
        val b = if (y > 0) raw(x - stride - 1) & 0xff else 0 // up
        val c = if (i >= bpp && y > 0) raw(x - stride - 1 - bpp) & 0xff else 0 // up-left
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => // Paeth
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
          case _ => return None
        }
        raw(x) = ((raw(x) & 0xff) + pred).toByte
        i += 1
      }
      y += 1
    }
    val px = new Array[Int](w * h)
    y = 0
    while (y < h) {
      val rowOff = y * (stride + 1) + 1
      var x = 0
      while (x < w) {
        val i = rowOff + x * channels
        val pix = colorType match {
          case 0 | 4 => val g = raw(i) & 0xff; (g << 16) | (g << 8) | g
          case _ =>
            ((raw(i) & 0xff) << 16) | ((raw(i + 1) & 0xff) << 8) | (raw(i + 2) & 0xff)
        }
        px(y * w + x) = pix
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, px))
  }

  /** Complete synthetic 8-bit RGB PNG for `id`: w = 1 + id % 16,
    * h = 1 + (id·7) % 16, pixel formulas r = (2·id + 11x + 3y) % 256,
    * g = (5·id + x·y + 2y) % 256, b = (7·id + 4x + 5y) % 256 — the
    * oracle's formulas. Row y is written with filter type y % 5, so a
    * decoder must reconstruct ALL FIVE standard filters correctly to
    * reproduce the pixels; the IDAT is a real Deflater zlib stream and
    * every chunk carries its true CRC32. */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = (1 + id % 16).toInt
    val h = (1 + (id * 7) % 16).toInt
    val stride = w * 3
    // raw reconstructed rows (filter predictions reference RAW bytes)
    val raw = Array.tabulate(h, stride) { (y, i) =>
      val x = i / 3
      (((i % 3): @unchecked) match {
        case 0 => (2 * id + 11 * x + 3 * y) % 256
        case 1 => (5 * id + x.toLong * y + 2 * y) % 256
        case 2 => (7 * id + 4 * x + 5 * y) % 256
      }).toByte
    }
    val filtered = new Array[Byte]((stride + 1) * h)
    for (y <- 0 until h) {
      val ft = y % 5
      filtered(y * (stride + 1)) = ft.toByte
      for (i <- 0 until stride) {
        val cur = raw(y)(i) & 0xff
        val a = if (i >= 3) raw(y)(i - 3) & 0xff else 0
        val b = if (y > 0) raw(y - 1)(i) & 0xff else 0
        val c = if (i >= 3 && y > 0) raw(y - 1)(i - 3) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case _ =>
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        filtered(y * (stride + 1) + 1 + i) = (cur - pred).toByte
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(filtered)
    defl.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!defl.finished()) zbuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val z = zbuf.toByteArray
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(bb.array(), 4, 4 + data.length)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", z) ++ chunk("IEND", Array.empty)
  }

  /** Decoded PCM audio: 16-bit signed samples, channel-interleaved. */
  final case class Pcm(sampleRate: Int, channels: Int, samples: Array[Int])

  /** Decode a 16-bit PCM WAV (RIFF/WAVE, fmt + data chunk walk — the same
    * chunk discipline as [[probeAv]] but materializing the samples).
    * None for compressed/float/other-width WAVs. */
  def decodeWavPcm(p: Array[Byte]): Option[Pcm] = {
    def u8(i: Int) = p(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)) & 0xffffffffL
    def ascii(i: Int, s: String) =
      i + s.length <= p.length && s.indices.forall(j => p(i + j) == s.charAt(j))
    if (p.length < 44 || !ascii(0, "RIFF") || !ascii(8, "WAVE")) return None
    var off = 12
    var rate = -1
    var channels = -1
    var dataStart = -1
    var dataLen = 0L
    while (off + 8 <= p.length && (rate < 0 || dataStart < 0)) {
      val size = le32(off + 4)
      if (ascii(off, "fmt ") && off + 24 <= p.length) {
        val fmt = le16(off + 8)
        channels = le16(off + 10)
        rate = le32(off + 12).toInt
        val bits = if (off + 24 + 10 <= p.length) le16(off + 8 + 14) else -1
        if (fmt != 1 || bits != 16 || channels <= 0 || rate <= 0) return None
      } else if (ascii(off, "data")) {
        dataStart = off + 8
        dataLen = size
      }
      val adv = 8L + size + (size & 1) // chunks pad to even length
      // hostile declared sizes saturate the cursor (ends the walk) rather
      // than rejecting — a data chunk already found still decodes, clamped
      // to the actual bytes present
      off = if (off + adv > Int.MaxValue) Int.MaxValue else (off + adv).toInt
    }
    if (rate < 0 || dataStart < 0) return None
    val n = math.min(dataLen, (p.length - dataStart).toLong).toInt / 2
    val samples = new Array[Int](n)
    var i = 0
    while (i < n) {
      samples(i) = (le16(dataStart + 2 * i) << 16) >> 16 // sign-extend
      i += 1
    }
    Some(Pcm(rate, channels, samples))
  }

  // -------- baseline JPEG (ITU-T T.81, public spec; pure JVM) --------
  //
  // Sequential baseline DCT, 8-bit, Huffman-coded, single scan: full
  // marker walk (APPn/COM/DQT/DHT/SOF0/DRI/SOS), byte-unstuffed bit
  // reading with RST handling, canonical Huffman decode (T.81 F.16
  // mincode/maxcode/valptr), DC prediction + receive/extend, dezigzag,
  // dequant, and a FIXED-POINT IDCT over the shared [[JpegCos]] table —
  // T.81 permits any conforming IDCT approximation; fixing the integer
  // table makes decode output exactly replayable by the DuckDB oracle
  // (the mm_decode_jpeg twin embeds the SAME table + shifts). Scope:
  // 4:4:4 YCbCr or grayscale, no progressive, no subsampling — other
  // shapes return None rather than guessing, same contract as PNG/BMP.

  /** Zigzag order: index k → natural position (row·8 + col). */
  private[ops] val JpegZigzag: Array[Int] = {
    val out = new Array[Int](64)
    var k = 0
    var d = 0
    while (d < 15) { // anti-diagonals; even d runs up-right, odd down-left
      val cells = (math.max(0, d - 7) to math.min(7, d)).map(r => (r, d - r))
      val run = if (d % 2 == 0) cells.reverse else cells
      run.foreach { case (r, c) => out(k) = r * 8 + c; k += 1 }
      d += 1
    }
    out
  }

  /** Fixed-point IDCT basis: JpegCos(x)(u) = round(Cu·cos((2x+1)uπ/16)·4096),
    * Cu = 1/√2 for u = 0 else 1. s(y,x) = (Σ_u Σ_v cos(x)(u)·cos(y)(v)·
    * Fq(v,u) + 2^25) >> 26, then +128, clamped — the 1/4 of the IDCT and
    * the two 2^12 table scales fold into one arithmetic shift (floor
    * semantics on BOTH sides: Scala `>>` and DuckDB `>>`). */
  val JpegCos: Array[Array[Int]] = Array.tabulate(8, 8) { (x, u) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    math.round(cu * math.cos((2 * x + 1) * u * math.Pi / 16.0) * 4096.0).toInt
  }

  /** Integer JFIF YCbCr→RGB (libjpeg's public fixed-point constants,
    * 2^16 scale, arithmetic-shift rounding — shared with the oracle). */
  @inline private[ops] def yccToRgb(yv: Int, cb: Int, cr: Int): Int = {
    @inline def cl(v: Int) = if (v < 0) 0 else if (v > 255) 255 else v
    val r = cl(yv + ((91881 * (cr - 128) + 32768) >> 16))
    val g = cl(yv - ((22554 * (cb - 128) + 46802 * (cr - 128) + 32768) >> 16))
    val b = cl(yv + ((116130 * (cb - 128) + 32768) >> 16))
    (r << 16) | (g << 8) | b
  }

  private final class JpegBitReader(p: Array[Byte], var off: Int) {
    private var acc = 0L
    private var nBits = 0
    /** True if positioned at an RST marker (consumes it). */
    def atRestart: Boolean = {
      if (nBits >= 8) return false // buffered data pending
      if (off + 1 < p.length && (p(off) & 0xff) == 0xff) {
        val m = p(off + 1) & 0xff
        if (m >= 0xd0 && m <= 0xd7) { off += 2; acc = 0L; nBits = 0; return true }
      }
      false
    }
    def bit(): Int = {
      if (nBits == 0) {
        if (off >= p.length) throw new java.io.EOFException
        val b = p(off) & 0xff
        off += 1
        if (b == 0xff) {
          val n = if (off < p.length) p(off) & 0xff else -1
          if (n == 0x00) off += 1 // stuffed byte
          else throw new java.io.EOFException // marker: scan data exhausted
        }
        acc = b.toLong; nBits = 8
      }
      nBits -= 1
      ((acc >> nBits) & 1L).toInt
    }
    def bits(n: Int): Int = { var v = 0; var i = 0; while (i < n) { v = (v << 1) | bit(); i += 1 }; v }
  }

  /** Canonical Huffman decode tables from a DHT (BITS + HUFFVAL). */
  private final class JpegHuff(bitsArr: Array[Int], vals: Array[Int]) {
    // T.81 F.16: mincode/maxcode/valptr per code length
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bitsArr(l - 1)
        k += bitsArr(l - 1)
        maxCode(l) = if (bitsArr(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def decode(in: JpegBitReader): Int = {
      var code = 0
      var l = 0
      while (l < 16) {
        code = (code << 1) | in.bit()
        l += 1
        if (maxCode(l) >= 0 && code <= maxCode(l) && code >= minCode(l))
          return vals(valPtr(l) + code - minCode(l))
      }
      throw new java.io.EOFException // invalid code
    }
  }

  /** Decode a baseline sequential JPEG (see section comment for scope).
    * Corrupt or out-of-scope input → None, never garbage or a hang. */
  def decodeJpeg(p: Array[Byte]): Option[Image] = try {
    def u8(i: Int) = p(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (p.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
    val quant = new Array[Array[Int]](4) // natural order
    val huffDc = new Array[JpegHuff](4)
    val huffAc = new Array[JpegHuff](4)
    var w = 0; var h = 0
    var comps: Array[(Int, Int, Int, Int)] = null // (id, hSamp, vSamp, tq)
    var restartInterval = 0
    var off = 2
    var scanOff = -1
    var scanSel: Array[(Int, Int, Int)] = null // (compIdx, td, ta)
    while (scanOff < 0) {
      if (off + 2 > p.length) return None
      if (u8(off) != 0xff) return None
      val m = u8(off + 1)
      // standalone markers have NO length field: optional 0xFF fill bytes
      // (B.1.1.2), TEM, and stray RSTn advance without reading a bogus
      // 2-byte length from payload bytes
      if (m == 0xff) { off += 1 }                           // fill byte
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { off += 2 } // TEM/RSTn
      else {
      if (off + 4 > p.length) return None
      val len = be16(off + 2)
      if (len < 2) return None
      val seg = off + 4
      m match {
        case 0xdb => // DQT: one or more tables, 8-bit precision only
          var q = seg
          while (q < off + 2 + len) {
            val pq = u8(q) >> 4; val tq = u8(q) & 15
            if (pq != 0 || tq > 3 || q + 65 > p.length) return None
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(JpegZigzag(i)) = u8(q + 1 + i); i += 1 }
            quant(tq) = t
            q += 65
          }
        case 0xc4 => // DHT: one or more tables
          var q = seg
          while (q < off + 2 + len) {
            val tc = u8(q) >> 4; val th = u8(q) & 15
            if (tc > 1 || th > 3) return None
            val bitsArr = Array.tabulate(16)(i => u8(q + 1 + i))
            val n = bitsArr.sum
            if (q + 17 + n > p.length) return None
            val vals = Array.tabulate(n)(i => u8(q + 17 + i))
            val t = new JpegHuff(bitsArr, vals)
            if (tc == 0) huffDc(th) = t else huffAc(th) = t
            q += 17 + n
          }
        case 0xc0 => // SOF0 baseline
          if (u8(seg) != 8) return None // bit depth
          h = be16(seg + 1); w = be16(seg + 3)
          val nc = u8(seg + 5)
          if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None
          if (nc != 1 && nc != 3) return None
          comps = Array.tabulate(nc) { i =>
            val b = seg + 6 + 3 * i
            (u8(b), u8(b + 1) >> 4, u8(b + 1) & 15, u8(b + 2))
          }
          if (comps.exists(c => c._2 != 1 || c._3 != 1)) return None // 4:4:4 only
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
             0xcd | 0xce | 0xcf =>
          return None // non-baseline SOF
        case 0xdd => restartInterval = be16(seg)
        case 0xda => // SOS
          if (comps == null) return None
          val ns = u8(seg)
          if (ns != comps.length) return None
          scanSel = Array.tabulate(ns) { i =>
            val cid = u8(seg + 1 + 2 * i)
            val ci = comps.indexWhere(_._1 == cid)
            if (ci < 0) return None
            (ci, u8(seg + 2 + 2 * i) >> 4, u8(seg + 2 + 2 * i) & 15)
          }
          scanOff = off + 2 + len
        case 0xd9 => return None // EOI before any scan
        case _ => // APPn / COM / others: skip
      }
      if (m != 0xda) off += 2 + len
      }
    }
    val nc = comps.length
    val mcuX = (w + 7) / 8
    val mcuY = (h + 7) / 8
    // per-component full-resolution sample planes (4:4:4 — one block each)
    val planes = Array.fill(nc)(new Array[Int](mcuX * 8 * mcuY * 8))
    val pred = new Array[Int](nc)
    val in = new JpegBitReader(p, scanOff)
    val coef = new Array[Int](64)
    var mcu = 0
    val nMcu = mcuX * mcuY
    while (mcu < nMcu) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!in.atRestart) return None
        java.util.Arrays.fill(pred, 0)
      }
      var c = 0
      while (c < nc) {
        val (ci, td, ta) = scanSel(c)
        val qt = quant(comps(ci)._4)
        if (qt == null || huffDc(td) == null || huffAc(ta) == null) return None
        java.util.Arrays.fill(coef, 0)
        // DC
        val s = huffDc(td).decode(in)
        val diff = if (s == 0) 0 else extend(in.bits(s), s)
        pred(ci) += diff
        coef(0) = pred(ci) * qt(0)
        // AC
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = huffAc(ta).decode(in)
          val r = rs >> 4; val sz = rs & 15
          if (sz == 0) {
            if (r == 15) k += 16 else eob = true // ZRL vs EOB
          } else {
            k += r
            if (k > 63) return None
            coef(JpegZigzag(k)) = extend(in.bits(sz), sz) * qt(JpegZigzag(k))
            k += 1
          }
        }
        // fixed-point IDCT into the component plane
        val plane = planes(ci)
        val bx = (mcu % mcuX) * 8
        val by = (mcu / mcuX) * 8
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            var acc = 0L
            var v = 0
            while (v < 64) {
              val f = coef(v)
              if (f != 0)
                acc += JpegCos(x)(v & 7).toLong * JpegCos(y)(v >> 3) * f
              v += 1
            }
            val sVal = ((acc + (1L << 25)) >> 26).toInt + 128
            plane((by + y) * mcuX * 8 + bx + x) =
              if (sVal < 0) 0 else if (sVal > 255) 255 else sVal
            x += 1
          }
          y += 1
        }
        c += 1
      }
      mcu += 1
    }
    val px = new Array[Int](w * h)
    val stride = mcuX * 8
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * stride + x
        px(y * w + x) =
          if (nc == 1) { val g = planes(0)(i); (g << 16) | (g << 8) | g }
          else yccToRgb(planes(0)(i), planes(1)(i), planes(2)(i))
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, px))
  } catch { case _: java.io.EOFException | _: ArrayIndexOutOfBoundsException => None }

  /** T.81 receive/extend: an `s`-bit amplitude with a 0 top bit encodes a
    * negative value. */
  @inline private def extend(v: Int, s: Int): Int =
    if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // Annex K.3 typical Huffman tables (public spec tables): (BITS, HUFFVAL)
  private val KDcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val KDcLumaVals = (0 to 11).toArray
  private val KDcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val KDcChromaVals = (0 to 11).toArray
  private val KAcLumaBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val KAcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val KAcChromaBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val KAcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  private final class JpegBitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 convention). */
    def flush(): Array[Byte] = {
      if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
      out.toByteArray
    }
  }

  /** Canonical (code, len) pairs for an Annex-K (BITS, HUFFVAL) pair. */
  private def huffCodes(bitsArr: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    val m = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bitsArr(l - 1)) { m(vals(k)) = (code, l); code += 1; k += 1; i += 1 }
      code <<= 1
      l += 1
    }
    m.toMap
  }

  /** Synthetic-JPEG quant table in natural order: DC 8, AC 16 (written in
    * zigzag order in the DQT, table id 0, used by all components). */
  private[ops] val JpegSynQuant: Array[Int] = Array.tabulate(64)(i => if (i == 0) 8 else 16)

  /** Synthetic-JPEG dims for `id`: 1, 2 or 4 MCUs (8/16 per axis), so the
    * graded row exercises MCU tiling and cross-block DC prediction. */
  private[ops] def jpegSynDims(id: Long): (Int, Int) =
    (8 + 8 * (id % 2).toInt, 8 + 8 * ((id / 2) % 2).toInt)

  /** Per-(id, component, block) synthetic coefficients (zigzag positions
    * 0, 1, 2, 5; all others zero; `b` = row-major block index) — the
    * formulas the oracle restates: dc = (id·(3+c) + 5b + c) % 128 − 64,
    * a1 = (id + 5c + 3b) % 15 − 7, a2 = (5·id + 3c + b) % 13 − 6,
    * a5 = (3·id + 7c + 11b) % 11 − 5. */
  private[ops] def jpegSynCoefs(id: Long, c: Int, b: Int): (Int, Int, Int, Int) = (
    ((id * (3 + c) + 5 * b + c) % 128 - 64).toInt,
    ((id + 5 * c + 3 * b) % 15 - 7).toInt,
    ((5 * id + 3 * c + b) % 13 - 6).toInt,
    ((3 * id + 7 * c + 11 * b) % 11 - 5).toInt)

  /** Complete synthetic baseline JPEG for `id`: [[jpegSynDims]]-sized
    * (1-4 MCUs), 4:4:4 YCbCr, Annex-K typical Huffman tables, quant
    * [[JpegSynQuant]], per-block coefficients [[jpegSynCoefs]]. The scan
    * is REALLY entropy-coded (categories, run-lengths, EOB, byte
    * stuffing, per-component DC prediction chained ACROSS MCUs), so the
    * decoder's Huffman walk, predictors, dezigzag, dequant, and IDCT all
    * gate the graded row. */
  def syntheticJpeg(id: Long): Array[Byte] = {
    val (w, h) = jpegSynDims(id)
    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, body: Array[Int]): Unit = {
      out.write(0xff); out.write(marker)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      body.foreach(out.write)
    }
    out.write(0xff); out.write(0xd8) // SOI
    // DQT table 0 (zigzag order = natural here for a flat-AC table)
    seg(0xdb, 0 +: Array.tabulate(64)(i => JpegSynQuant(JpegZigzag(i))))
    // SOF0: 8-bit, 3 components 1x1, all quant table 0
    seg(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 3,
      1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0))
    // DHT: DC0, AC0 (luma), DC1, AC1 (chroma)
    seg(0xc4, (0x00 +: (KDcLumaBits ++ KDcLumaVals)) ++
      (0x10 +: (KAcLumaBits ++ KAcLumaVals)) ++
      (0x01 +: (KDcChromaBits ++ KDcChromaVals)) ++
      (0x11 +: (KAcChromaBits ++ KAcChromaVals)))
    // SOS: Y uses tables 0/0, Cb and Cr 1/1
    seg(0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    val dcL = huffCodes(KDcLumaBits, KDcLumaVals)
    val acL = huffCodes(KAcLumaBits, KAcLumaVals)
    val dcC = huffCodes(KDcChromaBits, KDcChromaVals)
    val acC = huffCodes(KAcChromaBits, KAcChromaVals)
    val bw = new JpegBitWriter
    def size(v: Int): Int = { var s = 0; var a = math.abs(v); while (a > 0) { s += 1; a >>= 1 }; s }
    def amp(v: Int, s: Int): Int = if (v >= 0) v else v + (1 << s) - 1
    val pred = new Array[Int](3)
    var mcu = 0
    while (mcu < (w / 8) * (h / 8)) {
      var c = 0
      while (c < 3) {
        val (dc, a1, a2, a5) = jpegSynCoefs(id, c, mcu)
        val (dcT, acT) = if (c == 0) (dcL, acL) else (dcC, acC)
        // DC: encode the PREDICTED difference (per-component chain)
        val diff = dc - pred(c)
        pred(c) = dc
        val sD = size(diff)
        val (cd, ld) = dcT(sD)
        bw.put(cd, ld)
        if (sD > 0) bw.put(amp(diff, sD), sD)
        // AC run-length walk over zigzag 1..63
        val zz = new Array[Int](64)
        zz(1) = a1; zz(2) = a2; zz(5) = a5
        var run = 0
        var k = 1
        var lastNonZero = 0
        var i = 63
        while (i >= 1 && lastNonZero == 0) { if (zz(i) != 0) lastNonZero = i; i -= 1 }
        while (k <= lastNonZero) {
          if (zz(k) == 0) run += 1
          else {
            while (run > 15) { val (cz, lz) = acT(0xf0); bw.put(cz, lz); run -= 16 }
            val sA = size(zz(k))
            val (ca, la) = acT((run << 4) | sA)
            bw.put(ca, la)
            bw.put(amp(zz(k), sA), sA)
            run = 0
          }
          k += 1
        }
        if (lastNonZero < 63) { val (ce, le) = acT(0x00); bw.put(ce, le) } // EOB
        c += 1
      }
      mcu += 1
    }
    out.write(bw.flush())
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Integer nearest-neighbor resize to `tw`×`th` grayscale
    * (gray = (299·R + 587·G + 114·B) / 1000, floor — the BT.601 weights
    * in exact integer form). */
  def thumbnailGray(img: Image, tw: Int, th: Int): Array[Int] =
    Array.tabulate(tw * th) { i =>
      val tx = i % tw
      val ty = i / tw
      val sx = tx * img.width / tw
      val sy = ty * img.height / th
      val p = img.pixels(sy * img.width + sx)
      (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000
    }

  /** Complete synthetic 24-bit BMP file for `id`: dims from the id, pixel
    * (x, y) = R (id+7x+13y)%256, G (3id+5x+y)%256, B (x·y+id)%256 — the
    * formulas the oracle recomputes. Rows written bottom-up with real
    * padding; odd widths are common on purpose (1..16) so padding is
    * always exercised. */
  def syntheticBmp(id: Long): Array[Byte] = {
    val w = (1 + id % 16).toInt
    val h = (1 + (id * 7) % 16).toInt
    val rowBytes = (w * 3 + 3) & ~3
    val size = 54 + rowBytes * h
    val bb = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0.toShort).putShort(0.toShort).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1.toShort).putShort(24.toShort)
      .putInt(0).putInt(rowBytes * h).putInt(0).putInt(0).putInt(0).putInt(0)
    var y = h - 1 // bottom-up: last image row first
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val r = ((id + 7 * x + 13 * y) % 256).toInt
        val g = ((3 * id + 5 * x + y) % 256).toInt
        val b = ((x.toLong * y + id) % 256).toInt
        bb.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = rowBytes - w * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      y -= 1
    }
    bb.array()
  }

  /** Complete synthetic 16-bit PCM WAV for `id`: rate 8000·(1+id%4) Hz,
    * 1+id%2 channels, 64+id%64 samples, sample i = ((id·31 + i·17) % 4001)
    * − 2000 — again the oracle's formulas. */
  def syntheticWav(id: Long): Array[Byte] = {
    val rate = 8000 * (1 + id % 4).toInt
    val ch = (1 + id % 2).toInt
    val n = (64 + id % 64).toInt
    val dataLen = 2 * n
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16)
      .putShort(1.toShort).putShort(ch.toShort).putInt(rate)
      .putInt(rate * ch * 2).putShort((ch * 2).toShort).putShort(16.toShort)
    bb.put("data".getBytes).putInt(dataLen)
    var i = 0
    while (i < n) {
      bb.putShort((((id * 31 + i * 17) % 4001) - 2000).toShort)
      i += 1
    }
    bb.array()
  }
}
