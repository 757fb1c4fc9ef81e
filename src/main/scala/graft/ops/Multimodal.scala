package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * batch-wise in `mapPartitions` (the Scala analog of `mapInPandas` batch
  * UDFs — one buffer per batch, vectorizable library calls inside).
  *
  * The actual media decode is STUBBED (no image/audio libs in this
  * container): `decodeStub` produces a deterministic fake
  * (width/height/frames derived from payload bytes), clearly marked. The
  * Spark-side plumbing — schema, batching, partition sizing, output shape —
  * is real and tested; swapping the stub for a real JNI/FFI decoder is a
  * one-function change.
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
  // BMP, 16-bit PCM WAV, and (via the JDK's zlib) non-interlaced 8-bit PNG
  // are fully decodable without media libraries. The graded queries
  // synthesize complete FILES (headers + pixel / sample data, including
  // BMP's 4-byte row padding and PNG's per-row filters + chunk CRCs),
  // decode them with the real parsers below, and the DuckDB oracle
  // recomputes the expected content from the generator formulas — so a
  // padding, row-order, filter, or endianness bug in the decoder is a
  // correctness failure, not a stub detail. Only JPEG's entropy-coded
  // pixel data stays out of scope (decodeStub, honestly labeled).

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
