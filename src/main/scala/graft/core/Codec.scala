package graft.core

import java.nio.charset.StandardCharsets

/** Integer codecs for posting-list payloads.
  *
  * Semantics follow the reference engine's compression layer:
  *  - VByte varint (reference: `src/qq_mem/src/utils.cc:246-270`,
  *    `utils.h:230-283`): little-endian 7-bit groups, continuation bit 0x80
  *    set on all but the last byte.
  *  - Delta-gap encoding (reference: `utils.h:573-584`): docIds are
  *    delta-encoded across a posting list (first delta is vs. a supplied
  *    base, the reference seeds it with 0 via `skip_pre_doc_ids[0]=0`,
  *    `flash_containers.h:22`); positions/offsets delta-encoded within each
  *    posting starting from 0 (`flash_engine_dumper.h:456-461,566-575`).
  *  - Fixed-width bit-packing of value groups (reference PFor-style packs of
  *    128 values at width = max bits needed: `packed_value.h:87-128`, width
  *    rule `NumOfBits` `utils.h:286-294`).
  *
  * These run inside typed lambdas / Aggregators on executors — plain JVM
  * scalar code, never driver-side.
  */
object Varint {

  /** Append varint encoding of v (must be >= 0) to buf. */
  def encode(v: Int, buf: scala.collection.mutable.ArrayBuilder[Byte]): Unit = {
    require(v >= 0, s"varint requires non-negative value, got $v")
    var x = v
    while ((x & ~0x7f) != 0) {
      buf += ((x & 0x7f) | 0x80).toByte
      x >>>= 7
    }
    buf += x.toByte
  }

  def encodeAll(vs: Array[Int]): Array[Byte] = {
    val b = scala.collection.mutable.ArrayBuilder.make[Byte]
    b.sizeHint(vs.length * 2)
    var i = 0
    while (i < vs.length) { encode(vs(i), b); i += 1 }
    b.result()
  }

  /** Decode one varint starting at offset; returns (value, nextOffset). */
  def decodeOne(bytes: Array[Byte], offset: Int): (Int, Int) = {
    var x = 0
    var shift = 0
    var i = offset
    var b = 0
    do {
      b = bytes(i) & 0xff
      x |= (b & 0x7f) << shift
      shift += 7
      i += 1
    } while ((b & 0x80) != 0)
    (x, i)
  }

  /** Decode exactly n varints from bytes starting at offset 0. */
  def decodeAll(bytes: Array[Byte], n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var off = 0
    var i = 0
    while (i < n) {
      var x = 0
      var shift = 0
      var b = 0
      do {
        b = bytes(off) & 0xff
        x |= (b & 0x7f) << shift
        shift += 7
        off += 1
      } while ((b & 0x80) != 0)
      out(i) = x
      i += 1
    }
    out
  }
}

object Delta {

  /** Delta-gap encode a non-decreasing sequence against `base`. */
  def encode(vs: Array[Int], base: Int = 0): Array[Int] = {
    val out = new Array[Int](vs.length)
    var prev = base
    var i = 0
    while (i < vs.length) {
      out(i) = vs(i) - prev
      prev = vs(i)
      i += 1
    }
    out
  }

  def decode(deltas: Array[Int], base: Int = 0): Array[Int] = {
    val out = new Array[Int](deltas.length)
    var prev = base
    var i = 0
    while (i < deltas.length) {
      prev += deltas(i)
      out(i) = prev
      i += 1
    }
    out
  }
}

object BitPack {

  /** Bits needed to represent v (>=1 even for 0, matching the reference's
    * fixed-width pack where width 0 is not used). */
  def numBits(v: Int): Int = if (v == 0) 1 else 32 - Integer.numberOfLeadingZeros(v)

  /** Pack values at fixed width = max bits over the group.
    * Layout: [width: 1 byte][n: varint][packed bits, MSB-first]. */
  def pack(vs: Array[Int]): Array[Byte] = {
    var width = 1
    var i = 0
    while (i < vs.length) {
      val b = numBits(vs(i))
      if (b > width) width = b
      i += 1
    }
    val header = scala.collection.mutable.ArrayBuilder.make[Byte]
    header += width.toByte
    Varint.encode(vs.length, header)
    val head = header.result()
    val nBits = width * vs.length
    val body = new Array[Byte]((nBits + 7) / 8)
    var bitPos = 0
    i = 0
    while (i < vs.length) {
      val v = vs(i).toLong & 0xffffffffL
      var b = width - 1
      while (b >= 0) {
        if (((v >>> b) & 1L) != 0L)
          body(bitPos >> 3) = (body(bitPos >> 3) | (0x80 >>> (bitPos & 7))).toByte
        bitPos += 1
        b -= 1
      }
      i += 1
    }
    head ++ body
  }

  def unpack(bytes: Array[Byte]): Array[Int] = {
    val width = bytes(0) & 0xff
    val (n, bodyOff) = Varint.decodeOne(bytes, 1)
    val out = new Array[Int](n)
    var bitPos = 0
    var i = 0
    while (i < n) {
      var v = 0
      var b = 0
      while (b < width) {
        val byteIdx = bodyOff + (bitPos >> 3)
        val bit = (bytes(byteIdx) >>> (7 - (bitPos & 7))) & 1
        v = (v << 1) | bit
        bitPos += 1
        b += 1
      }
      out(i) = v
      i += 1
    }
    out
  }
}

/** Lossy 1-byte doc-length code — the Lucene `SmallFloat`-style
  * 3-mantissa-bit / 5-exponent-bit format the reference uses for its doc
  * length store (reference: `UintToChar4/Char4ToUint` `utils.h:301-329`,
  * used by `doc_length_store.h:110`). Must be bit-identical for BM25 score
  * parity; goldens from `tests_8.cc:25-49`:
  * 0→0, 7→7, 8→0x08, 0x80→0x28, 0xffffffff→(29<<3)|7,
  * decode(0x28)=0x80, decode((29<<3)|7)=0xf0000000.
  */
object LenByte {

  def encode(len: Long): Int = {
    val i = len & 0xffffffffL
    val numBits = 64 - java.lang.Long.numberOfLeadingZeros(i)
    if (numBits < 4) i.toInt
    else {
      val shift = (numBits - 4).toInt
      // keep 3 mantissa bits (msb is implicit, cleared) + biased exponent
      ((((i >>> shift) & 0x07) | ((shift + 1) << 3)) & 0xff).toInt
    }
  }

  def decode(b: Int): Long = {
    val bits = b & 0x07
    val shift = ((b & 0xff) >>> 3) - 1
    if (shift == -1) bits.toLong
    else ((bits | 0x08).toLong << shift) & 0xffffffffL
  }

  /** encode-then-decode: the lossy length actually used in scoring. */
  def lossy(len: Long): Long = decode(encode(len))
}

object Sha256 {
  def hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes(StandardCharsets.UTF_8)).map("%02x".format(_)).mkString
  }
}
