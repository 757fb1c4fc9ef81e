package graft.index

import graft.core.Tokenizer
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Phrase-pruning Bloom filters — the reference's two-way bloom store
  * (S10/J5): for every (term, doc), a filter over the terms that appear
  * immediately AFTER it ("end" filter) and one over the terms immediately
  * BEFORE it ("begin"), used as a lossy semi-join to skip the positional
  * phrase check for docs that cannot contain the phrase
  * (reference: `bloom_filter.h:277-345,562-670`,
  * `query_processing.h:766-807,873-884`; config expected_entries=5,
  * fp=0.0009 from `tools/indexer.py:43-44`).
  *
  * Hashing is murmur2-32 with double hashing (h1 + i·h2), same family as
  * the reference's libbloom; Spark's built-in sketch is deliberately not
  * used (different hashing — SURVEY.md §7.4).
  */
object Bloom {

  val ExpectedEntries = 5
  val FpRatio = 0.0009

  /** Optimal bit/hash counts for n entries at false-positive rate p. */
  def sizing(n: Int = ExpectedEntries, p: Double = FpRatio): (Int, Int) = {
    val ln2 = math.log(2.0)
    val m = math.max(8, math.ceil(-n * math.log(p) / (ln2 * ln2)).toInt)
    val k = math.max(1, math.round(m.toDouble / n * ln2).toInt)
    (m, k)
  }

  /** MurmurHash2 (32-bit, Austin Appleby's public-domain algorithm). */
  def murmur2(data: Array[Byte], seed: Int): Int = {
    val m = 0x5bd1e995
    val r = 24
    var h = seed ^ data.length
    var i = 0
    while (i + 4 <= data.length) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= m; k ^= k >>> r; k *= m
      h *= m; h ^= k
      i += 4
    }
    val rem = data.length - i
    if (rem >= 3) h ^= (data(i + 2) & 0xff) << 16
    if (rem >= 2) h ^= (data(i + 1) & 0xff) << 8
    if (rem >= 1) { h ^= data(i) & 0xff; h *= m }
    h ^= h >>> 13; h *= m; h ^= h >>> 15
    h
  }

  final class Filter(val bits: Array[Byte], val k: Int) {
    private def m = bits.length * 8
    private def set(pos: Int): Unit = bits(pos >> 3) = (bits(pos >> 3) | (1 << (pos & 7))).toByte
    private def get(pos: Int): Boolean = (bits(pos >> 3) & (1 << (pos & 7))) != 0
    def add(s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val h1 = murmur2(b, 0x9747b28c)
      val h2 = murmur2(b, 0x5bd1e995)
      var i = 0
      while (i < k) {
        set(java.lang.Math.floorMod(h1 + i * h2, m)); i += 1
      }
    }
    def mightContain(s: String): Boolean = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val h1 = murmur2(b, 0x9747b28c)
      val h2 = murmur2(b, 0x5bd1e995)
      var i = 0
      while (i < k) {
        if (!get(java.lang.Math.floorMod(h1 + i * h2, m))) return false
        i += 1
      }
      true
    }
  }

  def newFilter(nEntries: Int = ExpectedEntries): Filter = {
    val (m, k) = sizing(math.max(nEntries, ExpectedEntries))
    new Filter(new Array[Byte]((m + 7) / 8), k)
  }

  final case class BloomRow(term: String, docId: Int,
                            beginBits: Array[Byte], endBits: Array[Byte], k: Int)

  /** Build the two-way bloom store from the doc store: per (term, doc),
    * filters over the sets of immediately-preceding / following terms.
    * Map-only (no shuffle) — neighbors are computed per doc. */
  def buildStore(docs: Dataset[IndexBuilder.DocRow],
                 codeAnalyzer: Boolean = false): Dataset[BloomRow] = {
    import docs.sparkSession.implicits._
    docs.flatMap { d =>
      val begin = scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.Set[String]]
      val end = scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.Set[String]]
      if (!codeAnalyzer) {
        val toks = Tokenizer.terms(d.content)
        var i = 0
        while (i < toks.length) {
          if (i > 0)
            begin.getOrElseUpdate(toks(i), scala.collection.mutable.Set.empty) += toks(i - 1)
          if (i < toks.length - 1)
            end.getOrElseUpdate(toks(i), scala.collection.mutable.Set.empty) += toks(i + 1)
          i += 1
        }
      } else {
        // code analyzer: a position can carry the original token AND its
        // injected subtokens; a term's neighbor sets are ALL terms at the
        // adjacent positions — the exact over-approximation the positional
        // phrase join needs so subtoken phrases are never falsely pruned
        val grouped = Tokenizer.groupedCode(d.content)
        val atPos = scala.collection.mutable.HashMap
          .empty[Int, scala.collection.mutable.ArrayBuffer[String]]
        grouped.foreach { case (t, ps, _) =>
          ps.foreach(p => atPos.getOrElseUpdate(p,
            scala.collection.mutable.ArrayBuffer.empty) += t)
        }
        grouped.foreach { case (t, ps, _) =>
          ps.foreach { p =>
            atPos.get(p - 1).foreach(_.foreach(n =>
              begin.getOrElseUpdate(t, scala.collection.mutable.Set.empty) += n))
            atPos.get(p + 1).foreach(_.foreach(n =>
              end.getOrElseUpdate(t, scala.collection.mutable.Set.empty) += n))
          }
        }
      }
      // fixed sizing (expected_entries=5) like the reference's global config;
      // denser neighbor sets just raise the false-positive rate (lossy-safe)
      (begin.keySet ++ end.keySet).iterator.map { t =>
        val bf = newFilter()
        begin.get(t).foreach(_.foreach(bf.add))
        val ef = newFilter()
        end.get(t).foreach(_.foreach(ef.add))
        BloomRow(t, d.docId, bf.bits, ef.bits, bf.k)
      }
    }
  }

  /** Stage wrapper: builds + commits `bloom/` under the index dir. */
  def buildStage(spark: SparkSession, indexDir: String,
                 codeAnalyzer: Boolean = false): Unit = {
    import spark.implicits._
    if (!Manifest.isCommitted(indexDir, "bloom")) {
      val docs = spark.read.parquet(s"$indexDir/docstore").as[IndexBuilder.DocRow]
      buildStore(docs, codeAnalyzer).write.mode("overwrite").option("compression", "zstd")
        .parquet(s"$indexDir/bloom")
      Manifest.commit(spark, indexDir, "bloom")
    }
  }
}
