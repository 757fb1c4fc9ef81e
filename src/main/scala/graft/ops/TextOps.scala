package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines, built
  * from codegen'd `org.apache.spark.sql.functions` only (no UDFs in the hot
  * path), so Catalyst can push/prune/vectorize them.
  *
  * Every numeric output that faces the DuckDB oracle is either an integer or
  * an integer-quantized micro value (`round(x*1e6)` as long) computed from
  * exact integer inputs, making cross-engine hash comparison exact.
  */
object TextOps {

  /** The engine's tokenizer as a Catalyst expression — same semantics as
    * [[graft.core.Tokenizer]]: lowercase, split on non-[a-z0-9_], drop
    * empties. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9_]+"), x => x =!= lit(""))

  /** Whitespace tokens (the reference's doc-length rule, `types.cc:38-40`). */
  def wsTokens(c: Column): Column =
    filter(split(c, " +"), x => x =!= lit(""))

  /** Word n-gram shingles as space-joined strings (dedup/minhash input). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Collocation mining: corpus-level PMI over adjacent token bigrams —
    * the classic "which word pairs stick together" analysis a training-data
    * pipeline runs to find templated/boilerplate segments.
    *
    *   pmi = ln( P(w1,w2) / (P(w1)·P(w2)) )
    *       = ln( (c12 · U · U) / (B · c1 · c2) )
    *
    * The products are computed on exact BIGINTs (corpus token counts keep
    * them far under 2^53, so the double conversion of numerator and
    * denominator is EXACT) and one IEEE division + ln produces the micro-
    * quantized score — the same expression shape the DuckDB oracle runs,
    * so the contract is cross-engine deterministic. Two shuffles total
    * (bigram groupBy, unigram groupBy), both map-side combined; unigram
    * counts broadcast onto the bigram table. Scales as a word-count. */
  def collocations(df: DataFrame, textCol: String,
                   minCount: Long = 5L, topN: Int = 20): DataFrame = {
    val toks = df.select(tokens(col(textCol)).as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).cast("long").as("c"))
    val uTot = toks.select(sum(size(col("t"))).cast("long").as("u"))
    val bi = toks.select(explode(shingles(col("t"), 2)).as("bigram"))
    val bTot = bi.agg(count(lit(1)).cast("long").as("b"))
    val bCnt = bi.groupBy("bigram").agg(count(lit(1)).cast("long").as("n"))
      .filter(col("n") >= minCount)
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
    val joined = bCnt
      .join(broadcast(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1")), "w1")
      .join(broadcast(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2")), "w2")
      .crossJoin(broadcast(uTot)).crossJoin(broadcast(bTot))
    joined
      .withColumn("pmi_micro", round(log(
        (col("n") * col("u") * col("u")).cast("double") /
          (col("b") * col("c1") * col("c2")).cast("double")) * 1e6).cast("long"))
      .select(col("bigram"), col("n"), col("pmi_micro"))
      .orderBy(desc("pmi_micro"), asc("bigram"))
      .limit(topN)
  }

  /** Micro-quantized ratio of two integer columns (exact cross-engine). */
  def microRatio(num: Column, den: Column): Column =
    when(den === 0, lit(0L))
      .otherwise(round(num.cast("double") / den.cast("double") * 1e6).cast("long"))

  val StopWords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for", "on")

  /** Quality-scoring features per document: token count, mean token length
    * (micro), stopword ratio (micro), non-alphanumeric char ratio (micro),
    * plus a composite quality flag. */
  def qualityFeatures(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = tokens(col(textCol))
    val nTok = size(t)
    val charsTotal = length(col(textCol))
    val alnum = length(regexp_replace(lower(col(textCol)), "[^a-z0-9_ ]", ""))
    val stop = size(filter(t, x => x.isin(StopWords: _*)))
    val tokChars = aggregate(t, lit(0), (acc, x) => acc + length(x))
    df.select(
      col(idCol),
      nTok.as("n_tokens"),
      microRatio(tokChars, nTok).as("mean_token_len_micro"),
      microRatio(stop, nTok).as("stopword_ratio_micro"),
      microRatio(charsTotal - alnum, charsTotal).as("punct_ratio_micro"),
      (nTok >= 5 && nTok <= 100000).cast("int").as("len_ok"))
  }

  /** Marker-word language ID: per-language stopword hit counts + argmax
    * with deterministic tie-break by language code. A deliberately simple
    * deterministic heuristic (n-gram-free variant) expressible identically
    * in the DuckDB oracle. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "die", "das", "nicht"),
    "en" -> Seq("the", "and", "of", "is", "that"),
    "es" -> Seq("el", "los", "que", "y", "de"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  def langId(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = tokens(col(textCol))
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(t, x => x.isin(markers: _*)))
    }
    val best = scores.tail.foldLeft[Column](
      struct(scores.head._2.as("score"), lit(scores.head._1).as("lang"))) {
      case (acc, (lang, s)) =>
        // strict > keeps the earlier (alphabetically first) language on ties
        when(s > acc.getField("score"), struct(s.as("score"), lit(lang).as("lang")))
          .otherwise(acc)
    }
    val hitCols = scores.map { case (lang, s) => s.as(s"hits_$lang") }
    val predCol = when(best.getField("score") === 0, lit("unknown"))
      .otherwise(best.getField("lang")).as("pred_lang")
    df.select((col(idCol) +: hitCols :+ predCol): _*)
  }

  /** Token counting: engine tokens, whitespace tokens, and a BPE-ish
    * subword estimate (4 chars ≈ 1 token, ceil per word). */
  def tokenCounts(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = tokens(col(textCol))
    df.select(
      col(idCol),
      size(t).as("n_tokens"),
      size(wsTokens(col(textCol))).as("n_ws_tokens"),
      aggregate(t, lit(0), (acc, x) => acc + ceil(length(x).cast("double") / 4.0).cast("int"))
        .as("n_bpe_est"))
  }

  /** Content fingerprint: md5 over the normalized token stream — the
    * oracle-checkable canonical-content hash used for exact near-dup after
    * tokenization (whitespace/punctuation-insensitive). */
  def contentFingerprint(textCol: Column): Column =
    md5(concat_ws(" ", tokens(textCol)))

  /** PII patterns: (name, regex, placeholder). Deliberately restricted to
    * syntax with identical semantics in Java (Spark codegen) and RE2
    * (DuckDB oracle) dialects — character classes, bounded repetition,
    * `\b` — so the graded contract is cross-engine exact. Order matters
    * for redaction: emails first (their domains would otherwise be
    * mangled by later passes), then IPs, then phone numbers. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,10}", "<PHONE>"))

  /** Per-document PII hit counts (one column per [[PiiPatterns]] entry) —
    * the detection side of the pipeline's privacy pass. Map-only codegen
    * (`regexp_count`); scales as a pure projection. */
  def piiCounts(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val cnts = PiiPatterns.map { case (name, re, _) =>
      regexp_count(col(textCol), lit(re)).cast("long").as(s"n_$name")
    }
    df.select(col(idCol) +: cnts: _*)
  }

  /** PII redaction: every [[PiiPatterns]] match replaced by its placeholder
    * token, in pattern order. Map-only codegen (`regexp_replace` chain). */
  def redactPii(textCol: Column): Column =
    PiiPatterns.foldLeft(textCol) { case (c, (_, re, ph)) =>
      regexp_replace(c, re, ph)
    }

  /** Deterministic train/val/test split assignment for reproducible
    * training-data pipelines. The split key is the CONTENT fingerprint
    * (md5 over the normalized token stream), not the doc id, so
    * byte-identical (post-normalization) duplicates always land in the
    * SAME split — no train/test leakage through duplicate copies — and
    * the assignment is stable under re-sharding, re-ingestion, or id
    * reassignment. bucket = first 60 fingerprint bits mod 100;
    * `train` below `trainPct`, `val` below `trainPct+valPct`, `test`
    * otherwise. Pure per-row map, no shuffle — scales. */
  def splitAssign(df: DataFrame, textCol: String, idCol: String,
                  trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val bucket = pmod(
      conv(substring(contentFingerprint(col(textCol)), 1, 15), 16, 10).cast("long"),
      lit(100L))
    df.select(col(idCol), bucket.as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
  }

  private val WinnowM = (1L << 61) - 1 // Mersenne prime 2^61-1

  /** `(a * b) mod (2^61-1)` without overflow for small `b` (< ~2^20):
    * 2^64 ≡ 8 (mod 2^61-1), so the 128-bit product hi·2^64 + lo reduces to
    * hi·8 + (lo >>> 61) + (lo & M). */
  @inline private def mulModSmall(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = (lo & WinnowM) + (lo >>> 61) + hi * 8
    while (r >= WinnowM) r -= WinnowM
    r
  }

  /** Rolling (Rabin-Karp-style) winnowing fingerprints over token 4-grams:
    * polynomial hash of each shingle mod 2^61-1 (true modular arithmetic —
    * a plain `Long` `%` would overflow at h·B ≈ 2^81), keep per-window
    * minima, distinct. Deterministic; SQL-expressible with 128-bit ints
    * (the `fp_winnow` DuckDB oracle recomputes it exactly). */
  def winnowingFingerprints(toksArr: Array[String], k: Int = 4, window: Int = 8): Array[Long] = {
    if (toksArr.length < k) return Array.empty
    val B = 1000003L
    val hashes = new Array[Long](toksArr.length - k + 1)
    var i = 0
    while (i <= toksArr.length - k) {
      var h = 0L
      var j = 0
      while (j < k) {
        val s = toksArr(i + j)
        var hh = 0L
        var c = 0
        while (c < s.length) {
          hh = mulModSmall(hh, 131) + s.charAt(c)
          if (hh >= WinnowM) hh -= WinnowM
          c += 1
        }
        h = mulModSmall(h, B) + hh
        if (h >= WinnowM) h -= WinnowM
        j += 1
      }
      hashes(i) = h
      i += 1
    }
    if (hashes.length <= window) Array(hashes.min)
    else hashes.sliding(window).map(_.min).toArray.distinct
  }
}
