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
    // ONE corpus scan: unigrams and bigrams explode together and share one
    // count shuffle (bigram keys carry a space, token keys never do, so the
    // key spaces cannot collide); totals are sums over the grouped counts,
    // not extra corpus passes (previously 4 tokenize scans, now 1)
    val toks = df.select(tokens(col(textCol)).as("t"))
    val cnt = toks
      .select(explode(concat(col("t"), shingles(col("t"), 2))).as("g"))
      .groupBy("g").agg(count(lit(1)).cast("long").as("c"))
      .cache()
    val isBigram = col("g").contains(" ")
    val uni = cnt.filter(!isBigram).withColumnRenamed("g", "w")
    val uTot = uni.agg(sum(col("c")).cast("long").as("u"))
    val bTot = cnt.filter(isBigram).agg(sum(col("c")).cast("long").as("b"))
    val bCnt = cnt.filter(isBigram && col("c") >= minCount)
      .select(col("g").as("bigram"), col("c").as("n"))
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
    val joined = bCnt
      .join(broadcast(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1")), "w1")
      .join(broadcast(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2")), "w2")
      .crossJoin(broadcast(uTot)).crossJoin(broadcast(bTot))
    val out = joined
      .withColumn("pmi_micro", round(log(
        (col("n") * col("u") * col("u")).cast("double") /
          (col("b") * col("c1") * col("c2")).cast("double")) * 1e6).cast("long"))
      .select(col("bigram"), col("n"), col("pmi_micro"))
      .orderBy(desc("pmi_micro"), asc("bigram"))
      .limit(topN)
      .localCheckpoint() // eager: top-N rows, frees the count cache below
    cnt.unpersist(false)
    out
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

  /** Unigram language-model surprisal per document — the CCNet/KenLM-style
    * perplexity quality filter reduced to its deterministic core: the LM is
    * the corpus unigram distribution p(w) = count(w)/total, and a doc's
    * negative log likelihood Σ −ln p(w) proxies its perplexity (gibberish
    * and rare-token soup score high; templated text scores low).
    *
    * Exactness contract: each term's surprisal is micro-quantized ONCE
    * (round(1e6·ln(total/count)) — one exact-input IEEE division + ln,
    * identical in both engines), and the per-doc total is the INTEGER sum
    * Σ tf·nll_micro — no FP accumulation order anywhere. Outputs
    * (id, n_tokens, sum_nll_micro, avg_nll_micro).
    *
    * Shape at scale: one word-count aggregation for the LM, one broadcast-
    * able join of the per-doc tf table against it, one per-doc integer sum.
    * `tf` is the caller's (id, term, tf) table so a memoized corpus tf scan
    * is reused rather than re-tokenized. */
  def unigramNll(tf: DataFrame, idCol: String): DataFrame = {
    val totals = tf.agg(sum(col("tf")).cast("long").as("total"))
    val lm = tf.groupBy("term").agg(sum(col("tf")).cast("long").as("c"))
      .crossJoin(broadcast(totals))
      .select(col("term"),
        round(log(col("total").cast("double") / col("c").cast("double")) * 1e6)
          .cast("long").as("nll_micro"))
    tf.join(lm, "term")
      .groupBy(col(idCol))
      .agg(sum(col("tf")).cast("long").as("n_tokens"),
        sum(col("tf") * col("nll_micro")).cast("long").as("sum_nll_micro"))
      .withColumn("avg_nll_micro",
        round(col("sum_nll_micro").cast("double") / col("n_tokens").cast("double"))
          .cast("long"))
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

  /** Non-empty lines of a text column (the paragraph unit of line-level
    * dedup and repetition scoring — CCNet splits on newline the same way). */
  def docLines(c: Column): Column =
    filter(split(c, "\n"), x => x =!= lit(""))

  /** Gopher-style repetition signals per document (Rae et al. 2021, table
    * A1 — the standard quality-filter family for web-scale training data):
    *
    *  - `dup_line_ratio_micro`: fraction of the doc's non-empty lines that
    *    are repeats of an earlier line (1 − distinct/total);
    *  - `dup_trigram_ratio_micro`: same over word 3-grams — templated/
    *    boilerplate text scores high;
    *  - `top_bigram_ratio_micro`: fraction of all bigram occurrences taken
    *    by the single most frequent bigram.
    *
    * The line/3-gram ratios are pure per-row array arithmetic (codegen'd,
    * no shuffle); the top-bigram mode is an explode + two map-side-combined
    * aggregations — a word-count shape that scales like one. All ratios are
    * micro-quantized integers from exact integer inputs (cross-engine
    * exact). */
  def repetitionSignals(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = tokens(col(textCol))
    val base = df.select(col(idCol), docLines(col(textCol)).as("ls"),
      shingles(t, 2).as("g2"), shingles(t, 3).as("g3"))
    val arrStats = base.select(col(idCol),
      size(col("ls")).as("n_lines"),
      size(array_distinct(col("ls"))).as("d_lines"),
      size(col("g3")).as("n_g3"),
      size(array_distinct(col("g3"))).as("d_g3"),
      size(col("g2")).as("n_g2"))
    val topBigram = base.select(col(idCol), explode(col("g2")).as("b"))
      .groupBy(col(idCol), col("b")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(max(col("c")).as("top_g2"))
    arrStats.join(topBigram, Seq(idCol), "left")
      .select(col(idCol),
        col("n_lines").cast("long").as("n_lines"),
        microRatio(col("n_lines") - col("d_lines"), col("n_lines"))
          .as("dup_line_ratio_micro"),
        microRatio(col("n_g3") - col("d_g3"), col("n_g3"))
          .as("dup_trigram_ratio_micro"),
        microRatio(coalesce(col("top_g2"), lit(0L)), col("n_g2"))
          .as("top_bigram_ratio_micro"))
  }

  /** Corpus-level line deduplication (the CCNet paragraph-dedup analog:
    * drop lines that appear verbatim across documents — navigation chrome,
    * license headers, boilerplate). Per document:
    *
    *  - `n_lines` / `n_dup_lines`: non-empty lines, and how many of them
    *    occur in ≥ `minDocs` DISTINCT documents corpus-wide;
    *  - `clean_sha`: sha256 of the text reconstructed from the KEPT lines
    *    (original order, newline-joined) — the dedup output contract
    *    without shipping the full cleaned body through the oracle compare.
    *
    * Shape at scale: one explode (corpus lines), one hash aggregation per
    * distinct line (map-side combined; the distinct-doc count uses the
    * (line, doc) pre-aggregation below, never a count-distinct shuffle of
    * raw occurrences), one join back on the line key, one per-doc
    * aggregation. No driver materialization, no window. */
  def lineDedup(df: DataFrame, textCol: String, idCol: String,
                minDocs: Int = 2): DataFrame = {
    val lines = df
      .select(col(idCol), posexplode(docLines(col(textCol))))
      .toDF(idCol, "pos", "line")
    // distinct-doc count per line via two exact aggregations (the
    // (line, doc) dedup then a plain count) — partial-aggregable at every
    // step, unlike countDistinct's Expand rewrite over raw occurrences
    val ndocs = lines.select(col(idCol), col("line")).distinct()
      .groupBy("line").agg(count(lit(1)).as("ndocs"))
    lines.join(ndocs, "line")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_lines"),
        sum(when(col("ndocs") >= minDocs, 1L).otherwise(0L)).as("n_dup_lines"),
        array_sort(collect_list(struct(col("pos"),
          when(col("ndocs") < minDocs, col("line")).as("keep")))).as("ordered"))
      .select(col(idCol), col("n_lines"), col("n_dup_lines"),
        // concat_ws skips null elements, so dropped lines vanish while the
        // kept ones keep their original relative order
        sha2(concat_ws("\n", transform(col("ordered"), s => s.getField("keep"))), 256)
          .as("clean_sha"))
  }

  /** Fixed-window token chunking with overlap — the doc → training-sequence
    * split every pre-training pipeline runs before packing. Chunk i covers
    * tokens [i·stride, i·stride + chunkTokens) with stride = chunkTokens −
    * overlap; the final chunk clamps at the doc end. nChunks =
    * ceil((n − overlap)/stride) for n > overlap, else 1 (empty docs emit
    * nothing). Map-only (per-row array ops + one explode — no shuffle, no
    * state), so it composes with scan pruning at any corpus size. Returns
    * (id, chunk_idx, n_chunk_tokens, chunk_sha). */
  def chunkDocs(df: DataFrame, textCol: String, idCol: String,
                chunkTokens: Int = 64, overlap: Int = 8): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val staged = df.select(col(idCol), tokens(col(textCol)).as("tk"))
      .withColumn("n", size(col("tk")))
      .filter(col("n") > 0)
      .withColumn("n_chunks",
        when(col("n") <= overlap, lit(1))
          .otherwise(ceil((col("n") - lit(overlap)).cast("double") / stride).cast("int")))
    staged
      .select(col(idCol), col("tk"),
        posexplode(transform(sequence(lit(0), col("n_chunks") - 1),
          i => slice(col("tk"), i * stride + 1, lit(chunkTokens)))))
      .toDF(idCol, "tk", "chunk_idx", "chunk")
      .select(col(idCol), col("chunk_idx"),
        size(col("chunk")).cast("long").as("n_chunk_tokens"),
        sha2(concat_ws(" ", col("chunk")), 256).as("chunk_sha"))
  }

  /** Deterministic sequence packing (the GPT-style "concatenate the corpus
    * in a fixed order, slice into seqLen windows" layout): docs are laid
    * end to end in [[hashBucket]] order (ties by id) and each doc's global
    * token offset places it in bin = offset / seqLen at bin_offset =
    * offset % seqLen. The exclusive prefix sum is computed WITHOUT an
    * unpartitioned window: a range repartition on the order key, one
    * per-partition total collected to the driver (P rows), and a window
    * PARTITIONED by the range partition id — the classic two-pass scan, so
    * the operator scales with the largest partition, not the corpus. The
    * result is independent of where the range boundaries fall (offsets
    * accumulate in partition order = global order). Returns
    * (id, n_tokens, offset, bin_id, bin_offset). */
  def packSequences(df: DataFrame, idCol: String, nTokensCol: String,
                    seqLen: Long, salt: String = "graft",
                    partitions: Int = 32): DataFrame = {
    val spark = df.sparkSession
    require(seqLen > 0)
    val ordered = df
      .select(col(idCol), col(nTokensCol).cast("long").as("n_tokens"),
        hashBucket(col(idCol), salt).as("bucket"))
      .repartitionByRange(partitions, col("bucket"), col(idCol))
      .withColumn("pid", org.apache.spark.sql.functions.spark_partition_id())
    val partTotals: Map[Int, Long] = {
      import spark.implicits._
      ordered.groupBy("pid").agg(sum("n_tokens").as("t"))
        .as[(Int, Long)].collect().toMap
    }
    val offsets: Map[Int, Long] = {
      var acc = 0L
      partTotals.keys.toSeq.sorted.map { pid =>
        val o = pid -> acc
        acc += partTotals(pid)
        o
      }.toMap
    }
    val offsetDf = {
      import spark.implicits._
      broadcast(offsets.toSeq.toDF("pid", "part_offset"))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid"))
      .orderBy(col("bucket"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    ordered
      .withColumn("local_prefix", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .join(offsetDf, "pid")
      .withColumn("offset", col("part_offset") + col("local_prefix"))
      .select(col(idCol), col("n_tokens"), col("offset"),
        (col("offset") / seqLen).cast("long").as("bin_id"),
        pmod(col("offset"), lit(seqLen)).cast("long").as("bin_offset"))
  }

  /** Deterministic per-million hash bucket of an id column: the sampling
    * primitive. md5 of `id:salt`, first 15 hex digits (< 2^60, sign-safe)
    * mod 1e6 — reproducible across engines, runs, and partitionings. */
  def hashBucket(id: Column, salt: String): Column =
    pmod(conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 15),
      16, 10).cast("long"), lit(1000000L))

  /** Stratified deterministic sampling: keep a row iff its [[hashBucket]]
    * falls below its stratum's per-million rate. Rates are integers per
    * million (exact — no FP threshold), unknown strata default to 0 (drop).
    * Map-only (no shuffle, no state): the sample is a pushed filter, so at
    * 100 TB it composes with scan pruning, and membership is stable under
    * any re-partitioning or re-run. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       ratesPerMillion: Map[String, Long],
                       salt: String = "graft"): DataFrame = {
    val rate = ratesPerMillion.foldLeft(lit(0L)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("bucket", hashBucket(col(idCol), salt))
      .filter(col("bucket") < rate)
  }

  /** Quota sampling: the first `quota` rows PER STRATUM in deterministic
    * [[hashBucket]] order (ties broken by id) — the "N docs per language"
    * budget cut of a training-data mix. One partitioned window (never
    * unpartitioned: each stratum sorts independently, so the operator
    * scales with the largest stratum, not the corpus). */
  def quotaSample(df: DataFrame, idCol: String, strataCol: String,
                  quota: Int, salt: String = "graft"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(col("bucket"), col(idCol))
    df.withColumn("bucket", hashBucket(col(idCol), salt))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= quota)
  }

  /** Data-mixture sampling: a deterministic sample of `total` rows whose
    * source composition matches the target weights — the mixture-
    * rebalancing step of training-data assembly (50% wiki / 30% web /
    * 20% code regardless of raw availability). Weights are integer PARTS
    * (e.g. 50/30/20), so quota apportionment is exact Hamilton
    * (largest-remainder) arithmetic: quota = ⌊total·parts/Σparts⌋ plus one
    * for the largest integer remainders (ties to the lexicographically
    * smaller source) — no floating point anywhere, bit-identical in any
    * engine. A source with fewer rows than its quota contributes all of
    * them and the deficit is re-apportioned over the remaining sources by
    * the same rule, so the sample stays `total`-sized while capacity
    * remains. Within a source the quota-lowest rows by the salted hash
    * order are taken ([[quotaSample]]'s rank rule) — membership is stable
    * under corpus growth. Cost: one k-row count aggregation to the driver
    * (k = #sources) + one rank filter; scales like [[quotaSample]]. */
  def mixtureSample(df: DataFrame, idCol: String, sourceCol: String,
                    parts: Map[String, Long], total: Long,
                    salt: String = "graft"): DataFrame = {
    require(parts.nonEmpty && parts.valuesIterator.forall(_ > 0) && total >= 0,
      "parts must be positive and total non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    val inMix = df.filter(col(sourceCol).isin(parts.keys.toSeq: _*))
    val avail: Map[String, Long] =
      inMix.groupBy(sourceCol).count().as[(String, Long)].collect().toMap
    // exact Hamilton apportionment of `target` over `ws` (integer parts)
    def apportion(target: Long, ws: Seq[(String, Long)]): Map[String, Long] = {
      val psum = ws.map(_._2).sum
      val base = ws.map { case (s, p) =>
        (s, target * p / psum, target * p % psum)
      }
      val leftover = target - base.map(_._2).sum
      val bump = base.sortBy { case (s, _, r) => (-r, s) }
        .take(leftover.toInt).map(_._1).toSet
      base.map { case (s, q, _) => s -> (q + (if (bump(s)) 1L else 0L)) }.toMap
    }
    // cap at availability, re-apportion the deficit over uncapped sources;
    // each round retires >= 1 source, so the loop is bounded by #sources
    var quotas = Map.empty[String, Long]
    var live = parts.toSeq.sortBy(_._1)
    var remaining = total
    while (remaining > 0 && live.nonEmpty) {
      val q = apportion(remaining, live)
      val capped = live.collect { case (s, _) if q(s) > avail.getOrElse(s, 0L) => s }
      if (capped.isEmpty) {
        quotas ++= q
        remaining = 0
      } else {
        capped.foreach { s =>
          val a = avail.getOrElse(s, 0L)
          quotas += s -> a
          remaining -= a
        }
        live = live.filterNot { case (s, _) => capped.contains(s) }
      }
    }
    val qDf = broadcast(quotas.toSeq.toDF(sourceCol, "_quota"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(col("bucket"), col(idCol))
    inMix
      .withColumn("bucket", hashBucket(col(idCol), salt))
      .withColumn("rn", row_number().over(w))
      .join(qDf, sourceCol)
      .filter(col("rn") <= col("_quota"))
      .drop("_quota")
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

  // ---------- code-identifier subtokens ----------

  /** Code-identifier subtoken split — the analyzer step every code-search
    * engine adds so `bar` finds `fooBar` and `foo_bar` (GitHub/Sourcegraph
    * style). The rule IS this pinned two-regex transform, identical on all
    * three surfaces (Scala, Column, DuckDB SQL):
    *
    *   1. "([A-Z]+)([A-Z][a-z])" → "$1 $2"   (acronym│Word: HTTPServer)
    *   2. "([a-z0-9])([A-Z])"    → "$1 $2"   (camel boundary: fooBar)
    *   then lowercase, split on non-alphanumerics, drop empties.
    */
  def subtokens(ident: String): Array[String] =
    graft.core.Tokenizer.subtokens(ident)

  /** Column form of [[subtokens]] — codegen'd regexp_replace chain, no UDF. */
  def subtokensCol(c: Column): Column =
    filter(split(lower(
      regexp_replace(regexp_replace(c, "([A-Z]+)([A-Z][a-z])", "$1 $2"),
        "([a-z0-9])([A-Z])", "$1 $2")), "[^a-z0-9]+"), x => x =!= lit(""))
}

/** Byte-pair-encoding merge learning — distributed tokenizer training, the
  * step a real training-data pipeline runs over the corpus before any
  * token counting is meaningful. Standard BPE (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units"): start
  * from characters, repeatedly merge the globally most frequent adjacent
  * symbol pair, weighted by word frequency.
  *
  * Deterministic semantics, engine-portable by construction:
  *  - pair choice: max total count, ties by (left, right) ascending;
  *  - per-round merge application is the GREEDY LEFT-TO-RIGHT fold — walk
  *    the symbol list once, merging (a, b) whenever the last emitted
  *    symbol is exactly `a` (never a symbol just created this round: the
  *    created symbol is a||b ≠ a) and the next is `b`. This is expressible
  *    as a `list_reduce` fold in SQL, so the DuckDB oracle replays the
  *    whole training loop.
  *
  * Scale shape: the word-frequency table (distinct words, not the corpus)
  * is the working set; each round is one map-side-combinable pair count, a
  * 1-row TakeOrdered argmax to the driver, and a map to apply the merge —
  * N rounds = N scans of the (cached) word table, the textbook
  * distributed-BPE layout.
  */
object BpeTrainer {
  import org.apache.spark.sql.DataFrame

  /** Greedy left-to-right single-pair merge (one BPE round). */
  def mergeGreedy(syms: IndexedSeq[String], a: String, b: String): IndexedSeq[String] = {
    if (syms.length < 2) return syms
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (out.nonEmpty && out.last == a && syms(i) == b) {
        out(out.length - 1) = a + b
      } else out += syms(i)
      i += 1
    }
    out.toIndexedSeq
  }

  /** Learn `n` merges over a (word, cnt) frequency table; returns one row
    * per round: (step, left, right, merged, cnt). Stops early if no
    * adjacent pair remains. */
  def learn(words: DataFrame, wordCol: String, cntCol: String, n: Int): Seq[(Int, String, String, String, Long)] = {
    val spark = words.sparkSession
    import spark.implicits._
    var cur = words
      .select(filter(split(col(wordCol), ""), x => x =!= lit("")).as("sym"),
        col(cntCol).cast("long").as("cnt"))
      .as[(Seq[String], Long)].cache()
    var prev: Option[org.apache.spark.sql.Dataset[(Seq[String], Long)]] = None
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var step = 1
    while (step <= n) {
      // ONE job per round: the argmax collect also materializes cur's
      // cache, so the previous round's cache can be dropped right after
      val best = cur.toDF("sym", "cnt")
        .select(posexplode(col("sym")).as(Seq("i", "left")), col("sym"), col("cnt"))
        .filter(col("i") < size(col("sym")) - 1)
        .select(col("left"), element_at(col("sym"), col("i") + 2).as("right"), col("cnt"))
        .groupBy("left", "right").agg(sum("cnt").as("c"))
        .orderBy(desc("c"), asc("left"), asc("right"))
        .limit(1).collect()
      prev.foreach(_.unpersist(false))
      prev = Some(cur)
      if (best.isEmpty) step = n + 1
      else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += ((step, a, b, a + b, c))
        cur = cur.map { case (syms, cnt) =>
          (mergeGreedy(syms.toIndexedSeq, a, b): Seq[String], cnt) }.cache()
        step += 1
      }
    }
    cur.unpersist(false)
    prev.foreach(_.unpersist(false))
    out.toSeq
  }
}
