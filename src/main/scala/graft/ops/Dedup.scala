package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, all shuffle-aware:
  *
  *  - exact: hash-groupBy on a content digest — one partial+final agg.
  *  - minhash + LSH: shingle → md5-based minhash signature (cross-engine
  *    reproducible: the per-seed hash is the md5 hex string itself, min =
  *    lexicographic) → band keys → bucket self-join restricted to bucket
  *    groups (never an all-pairs cartesian).
  *  - simhash: 60-bit md5-derived hyperplane signature; near-dups = equal
  *    high bands or hamming-close (verified pairwise within buckets).
  *  - n-gram Jaccard: exact verification metric on candidate pairs.
  *  - embedding cosine near-dup: see [[Similarity]].
  *
  * Scale: every candidate-generation step is a groupBy/join on a bounded
  * key (digest, band key); the only pairwise work happens inside buckets,
  * which LSH keeps small. Skewed buckets (e.g. boilerplate docs) are capped
  * explosion-safe by `maxBucket`.
  */
object Dedup {

  /** Exact duplicate groups by content digest (optionally
    * tokenization-normalized so whitespace/punct differences collapse). */
  def exactGroups(df: DataFrame, textCol: String, idCol: String,
                  normalized: Boolean = true): DataFrame = {
    val digest = if (normalized) TextOps.contentFingerprint(col(textCol)) else md5(col(textCol))
    df.select(col(idCol), digest.as("digest"))
      .groupBy("digest")
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keep_id"),
           sort_array(collect_list(col(idCol))).as("members"))
  }

  /** md5-hex minhash signature over word `n`-gram shingles, `sigLen` seeds.
    * Each component is `min over shingles of md5(seed || ':' || shingle)` —
    * a string min, identical in any engine with md5. */
  def minhashSig(textCol: Column, n: Int = 3, sigLen: Int = 8): Column = {
    val sh = TextOps.shingles(TextOps.tokens(textCol), n)
    val comps = (0 until sigLen).map { seed =>
      array_min(transform(sh, s => md5(concat(lit(seed.toString), lit(":"), s))))
    }
    array(comps: _*)
  }

  /** LSH candidate pairs: signature split into `bands` bands; docs sharing
    * any band key are candidates. Output: (id_a, id_b, band) distinct pairs,
    * id_a < id_b. */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 3, sigLen: Int = 8, bands: Int = 4,
                        maxBucket: Int = 1000): DataFrame = {
    val rows = sigLen / bands
    // cache: the sig expression is md5-heavy; evaluate once per doc, not per
    // band per join side
    val withSig = df.select(col(idCol).as("id"), minhashSig(col(textCol), n, sigLen).as("sig"))
      .cache()
    val banded = withSig.select(
      col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => md5(concat_ws("|", slice(col("sig"), lit(b * rows + 1), lit(rows)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
    // cap pathological buckets before the self-join (skew guard)
    val sized = banded.withColumn("bsize",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("band", "bkey")))
      .filter(col("bsize") <= maxBucket && col("bsize") > 1)
    val a = sized.select(col("band"), col("bkey"), col("id").as("id_a"))
    val b = sized.select(col("band"), col("bkey"), col("id").as("id_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact n-gram Jaccard similarity for (candidate) pairs — the verifier
    * after LSH, and a direct metric for small corpora. */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, textCol: String, idCol: String,
                   n: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("jid"),
      array_distinct(TextOps.shingles(TextOps.tokens(col(textCol)), n)).as("sh"))
    pairs
      .join(sh.withColumnRenamed("jid", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("jid", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        TextOps.microRatio(
          size(array_intersect(col("sh_a"), col("sh_b"))),
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard_micro"))
  }

  /** 60-bit simhash from md5-derived token hashes, tf-weighted. Scala-side
    * (bit-twiddling is not worth a 60-aggregate SQL oracle); deterministic
    * and unit-tested against a direct reimplementation. */
  def simhash60(tokens: Array[String]): Long = {
    if (tokens.isEmpty) return 0L
    val acc = new Array[Int](60)
    tokens.foreach { t =>
      val h = java.lang.Long.parseLong(graft.ops.Dedup.md5Hex(t).substring(0, 15), 16)
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (acc(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  def md5Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  def hamming60(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Simhash near-dup candidates: docs whose signatures agree on any of 4
    * 15-bit bands (guarantees recall for hamming distance <= 3). */
  def simhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        maxHamming: Int = 3): DataFrame = {
    import df.sparkSession.implicits._
    val sigUdf = udf { t: String => simhash60(graft.core.Tokenizer.terms(t)) }
    val sigs = df.select(col(idCol).as("id"), sigUdf(col(textCol)).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(b => shiftrightunsigned(col("sig"), b * 15) % 32768): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
    val a = banded.select($"band", $"bkey", $"id".as("id_a"), $"sig".as("sig_a"))
    val b = banded.select($"band", $"bkey", $"id".as("id_b"), $"sig".as("sig_b"))
    val ham = udf { (x: Long, y: Long) => hamming60(x, y) }
    a.join(b, Seq("band", "bkey"))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b", ham($"sig_a", $"sig_b").as("hamming"))
      .distinct()
      .filter($"hamming" <= maxHamming)
  }
}
