package graft.core

import java.nio.charset.StandardCharsets

/** LZ4-compressed document blob (F13) — the reference doc store's chunked
  * compression format re-expressed on lz4-java (which is already on
  * Spark's classpath as its shuffle/IO codec library; no new dependency):
  *
  *   [magic 0x33][varint nChunks][varint compressedSize x nChunks][chunks]
  *
  * UTF-8 text is split into <= 16 KiB chunks, each LZ4 block-compressed
  * independently so a reader can decompress any chunk with a bounded
  * 16 KiB buffer — the reference's `CompressBoundedText` / `EncodeHeader`
  * / `DecodeHeader` scheme (`doc_store.h:28-127`) with the same magic
  * (`types.h:41 COMPRESSED_DOC_MAGIC`) and chunk bound
  * (`doc_store.h:28` "not larger than 16*1024").
  *
  * The engine's persistent docstore remains parquet+zstd (columnar storage
  * already compresses pages); this codec is the row-level doc blob format
  * for byte-compatible interchange and for stores that need per-doc random
  * access to compressed bodies.
  */
object Lz4Doc {

  val Magic = 0x33
  val ChunkBytes = 16 * 1024

  // fastestInstance prefers JNI, falls back to pure-Java — same selection
  // Spark's own codecs use; one factory per JVM
  private lazy val factory = net.jpountz.lz4.LZ4Factory.fastestInstance()

  def compress(text: String): Array[Byte] = {
    val data = text.getBytes(StandardCharsets.UTF_8)
    val comp = factory.fastCompressor()
    val nChunks = (data.length + ChunkBytes - 1) / ChunkBytes
    val chunks = new Array[Array[Byte]](nChunks)
    var i = 0
    while (i < nChunks) {
      val off = i * ChunkBytes
      val len = math.min(ChunkBytes, data.length - off)
      chunks(i) = comp.compress(data, off, len)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuilder.make[Byte]
    out.sizeHint(8 + chunks.iterator.map(_.length).sum)
    out += Magic.toByte
    Varint.encode(nChunks, out)
    chunks.foreach(c => Varint.encode(c.length, out))
    chunks.foreach(out ++= _)
    out.result()
  }

  /** Number of chunks recorded in a blob's header. */
  def chunkCount(blob: Array[Byte]): Int = {
    require((blob(0) & 0xff) == Magic, "bad doc blob magic")
    Varint.decodeOne(blob, 1)._1
  }

  def decompress(blob: Array[Byte]): String = {
    require((blob(0) & 0xff) == Magic, "bad doc blob magic")
    val (nChunks, afterN) = Varint.decodeOne(blob, 1)
    val sizes = new Array[Int](nChunks)
    var off = afterN
    var i = 0
    while (i < nChunks) {
      val (v, next) = Varint.decodeOne(blob, off)
      sizes(i) = v
      off = next
      i += 1
    }
    val de = factory.safeDecompressor()
    val parts = scala.collection.mutable.ArrayBuilder.make[Byte]
    i = 0
    while (i < nChunks) {
      parts ++= de.decompress(blob, off, sizes(i), ChunkBytes)
      off += sizes(i)
      i += 1
    }
    new String(parts.result(), StandardCharsets.UTF_8)
  }
}
