package graft.index

import graft.core.{Delta, Varint}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Character-trigram index for substring and regex search over source code.
  *
  * The reference engine answers only tokenized term queries
  * (`qq_mem_engine.h:318-367`); a code-search deployment additionally needs
  * raw substring / regex lookup (`grep foo_bar(`), which a term index cannot
  * serve once the needle straddles token boundaries. The standard structure
  * is the character-trigram posting index of Google Code Search (R. Cox,
  * "Regular Expression Matching with a Trigram Index", 2012, public): every
  * document posts each distinct character trigram of its text; a substring
  * query intersects the posting lists of the needle's trigrams to get a
  * candidate superset, then verifies candidates with an exact `contains` —
  * results are exact, the index only prunes.
  *
  * Layout mirrors the term index's block shape ([[PostingCodec]]): per
  * trigram, ascending doc_ids in delta-gap varint runs of ≤128
  * (`posting_list_delta.h:130-151` analog), so skip-style pruning and the
  * same storage math apply.
  *
  * Scale shape (10^12 files): the build is one explode + one term-partitioned
  * shuffle — identical to the inverted-index build (A2), and hot trigrams
  * (`" th"`-class, df ≈ n_docs) are bounded per-row by the 128-run encoding.
  * Query-side the planner never decodes every trigram of a long needle: it
  * consults trigram df stats and intersects only the `rarestK` rarest
  * trigrams (Cox's cost rule) — candidate quality degrades gracefully while
  * decode cost stays O(k · min df), and exact verification keeps results
  * correct regardless of the subset chosen.
  */
object TrigramIndex {

  /** Distinct character trigrams of `text`, first-seen order. Raw
    * characters — no lowercasing or tokenization: substring semantics are
    * defined on the stored text exactly as `contains` sees it. */
  def trigramsOf(text: String): Array[String] = {
    if (text == null || text.length < 3) return Array.empty
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    var i = 0
    val n = text.length - 2
    while (i < n) {
      seen += text.substring(i, i + 3)
      i += 1
    }
    seen.toArray
  }

  /** Build trigram posting runs over `(idCol, textCol)` rows:
    * (tri, prevDocId, n, docIds) with doc_ids ascending per trigram,
    * delta-gap varint in runs of ≤128.
    *
    * Shape: one per-doc trigram explode, then a hash repartition on
    * (trigram, docId-range bucket) + in-partition sort + STREAMING run
    * encode (mapPartitions) — never a per-group array, so a trigram with
    * df ≈ n_docs (`" th"`-class at 10^12 files) encodes in bounded memory;
    * `collect_list` here would both OOM the hot groups and trip the
    * object-agg sort fallback. The `saltSpan` docId-range bucket is the
    * trigram analog of [[IndexBuilder]]'s hot-term salting: it caps any
    * single partition's share of one trigram at `saltSpan` postings. Runs
    * are self-describing (each stores its own delta base), so decoding
    * never needs to know where bucket cuts fell — a run that starts a
    * bucket seeds prev = 0 and carries absolute ids from there. */
  /** Lossless 48-bit pack of a trigram's three UTF-16 chars — the shuffle
    * key is a primitive long instead of a heap string (measured ~2× on the
    * build's explode+sort, and radix-sortable in Tungsten). */
  def triPack(t: String): Long =
    (t.charAt(0).toLong << 32) | (t.charAt(1).toLong << 16) | t.charAt(2).toLong
  def triUnpack(p: Long): String = new String(Array(
    ((p >> 32) & 0xFFFF).toChar, ((p >> 16) & 0xFFFF).toChar, (p & 0xFFFF).toChar))

  def buildBlocks(docs: DataFrame, idCol: String, textCol: String,
                  saltSpan: Int = 1 << 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("int").as("doc_id"), col(textCol).as("text"))
      .as[(Int, String)]
      .flatMap { case (id, text) =>
        // distinct packed trigrams of this doc, insertion order
        val seen = new java.util.LinkedHashSet[java.lang.Long]()
        var i = 0
        val n = if (text == null) 0 else text.length - 2
        while (i < n) {
          seen.add(
            (text.charAt(i).toLong << 32) | (text.charAt(i + 1).toLong << 16) |
              text.charAt(i + 2).toLong)
          i += 1
        }
        val out = new Array[(Long, Int)](seen.size)
        val it = seen.iterator(); var j = 0
        while (it.hasNext) { out(j) = (it.next().longValue(), id); j += 1 }
        out.iterator
      }
      .toDF("tkey", "doc_id")
      .repartition(col("tkey"), expr(s"doc_id div $saltSpan"))
      .sortWithinPartitions("tkey", "doc_id")
      .select("tkey", "doc_id")
      .as[(Long, Int)]
      .mapPartitions { it =>
        new Iterator[(String, Int, Int, Array[Byte])] {
          private var cur: (Long, Int) = if (it.hasNext) it.next() else null
          private val run = new Array[Int](128)
          // rows arrive sorted by (tkey, doc_id): a trigram's runs are
          // consecutive, so the delta base is the previous run's last id
          // when the trigram continues, 0 when a new trigram starts
          private var prevKey = Long.MinValue
          private var prevLast = 0
          def hasNext: Boolean = cur != null
          def next(): (String, Int, Int, Array[Byte]) = {
            val key = cur._1
            val prev = if (key == prevKey) prevLast else 0
            var n = 0
            while (cur != null && cur._1 == key && n < 128) {
              run(n) = cur._2; n += 1
              cur = if (it.hasNext) it.next() else null
            }
            val ids = java.util.Arrays.copyOf(run, n)
            prevKey = key; prevLast = ids(n - 1)
            (triUnpack(key), prev, n, Varint.encodeAll(Delta.encode(ids, prev)))
          }
        }
      }
      .toDF("tri", "prevDocId", "n", "docIds")
  }

  /** Decode one run back to absolute doc_ids. */
  def decodeRun(prevDocId: Int, n: Int, blob: Array[Byte]): Array[Int] =
    Delta.decode(Varint.decodeAll(blob, n), prevDocId)

  /** Trigram df stats from the blocks: (tri, df). Metadata-only (Σn). */
  def triStats(blocks: DataFrame): DataFrame =
    blocks.groupBy("tri").agg(sum(col("n")).cast("long").as("df"))

  /** dfs of exactly `tris`: one `tri IN (...)` metadata probe returning
    * ≤ |tris| rows. The planner only ever needs the dfs of the NEEDLE's
    * trigrams (≤ needle length), so a query never materializes the full
    * trigram dictionary on the driver — over arbitrary UTF-16 content that
    * dictionary is effectively unbounded (any char triple), while this
    * probe is bounded by the query. Trigrams absent from the index are
    * absent from the map (df 0 to [[planTrigrams]]). */
  def probeTriDfs(blocks: DataFrame, tris: Seq[String]): Map[String, Long] = {
    val spark = blocks.sparkSession
    import spark.implicits._
    val distinct = tris.distinct
    if (distinct.isEmpty) Map.empty
    else blocks.filter(col("tri").isin(distinct: _*))
      .groupBy("tri").agg(sum(col("n")).cast("long").as("df"))
      .as[(String, Long)].collect().toMap
  }

  /** The query planner's trigram pick for `needle`: the `rarestK` rarest of
    * the needle's distinct trigrams by indexed df (ties by trigram asc, the
    * deterministic order), from the provided stats. Trigrams absent from
    * the stats have df 0 — the needle cannot match anything and the caller
    * can short-circuit to empty. Returns (chosen trigrams, anyAbsent). */
  def planTrigrams(stats: Map[String, Long], needle: String,
                   rarestK: Int): (Seq[String], Boolean) = {
    val tris = trigramsOf(needle)
    if (tris.isEmpty) return (Nil, false)
    val absent = tris.exists(t => stats.getOrElse(t, 0L) == 0L)
    val chosen = tris.sortBy(t => (stats.getOrElse(t, 0L), t)).take(rarestK)
    (chosen.toSeq, absent)
  }

  /** Candidate doc_ids that contain ALL `tris` (posting-list k-way
    * intersection over the decoded runs — J2's shape on the trigram
    * index). (tri, doc_id) rows are unique by construction, so a plain
    * count equals the distinct-trigram count. */
  def candidates(blocks: DataFrame, tris0: Seq[String]): DataFrame = {
    val spark = blocks.sparkSession
    import spark.implicits._
    // dedupe defensively: a duplicated trigram would raise the required
    // match count above what any doc can reach (one posting per pair)
    val tris = tris0.distinct
    if (tris.isEmpty) return spark.emptyDataFrame.select(lit(0).as("doc_id")).limit(0)
    val k = tris.size
    blocks.filter(col("tri").isin(tris: _*))
      .select("tri", "prevDocId", "n", "docIds")
      .as[(String, Int, Int, Array[Byte])]
      .flatMap { case (t, prev, n, blob) =>
        decodeRun(prev, n, blob).iterator.map(id => (t, id))
      }
      .toDF("tri", "doc_id")
      .groupBy("doc_id").agg(count(lit(1)).as("nm"))
      .filter(col("nm") === k)
      .select("doc_id")
  }

  /** Exact substring search: trigram candidates, then verify `contains`
    * against the stored text. For needles shorter than 3 chars there are
    * no trigrams to prune with — full verify scan (exact, just unpruned).
    * Output: (doc_id) of docs whose text contains `needle`. */
  def substringSearch(docs: DataFrame, blocks: DataFrame, stats: Map[String, Long],
                      needle: String, idCol: String = "doc_id",
                      textCol: String = "text", rarestK: Int = 8): DataFrame = {
    val verified =
      if (needle.length < 3) docs
      else {
        val (tris, anyAbsent) = planTrigrams(stats, needle, rarestK)
        if (anyAbsent) return docs.select(col(idCol).cast("long").as("doc_id")).limit(0)
        val cand = candidates(blocks, tris).withColumnRenamed("doc_id", "cand_id")
        docs.join(cand, docs(idCol).cast("int") === col("cand_id")).drop("cand_id")
      }
    verified.filter(col(textCol).contains(needle))
      .select(docs(idCol).cast("long").as("doc_id"))
  }

  /** Persisted index stage: builds + commits `trigrams/` under the index
    * dir from the committed docstore (content keyed by docId), making
    * substring/regex search a first-class capability of a loaded engine. */
  def buildStage(spark: SparkSession, indexDir: String): Unit = {
    if (!Manifest.isCommitted(indexDir, "trigrams")) {
      val docs = spark.read.parquet(s"$indexDir/docstore")
        .select(col("docId").as("doc_id"), col("content").as("text"))
      buildBlocks(docs, "doc_id", "text")
        .write.mode("overwrite").option("compression", "zstd")
        .parquet(s"$indexDir/trigrams")
      Manifest.commit(spark, indexDir, "trigrams")
    }
  }

  /** Required trigrams of a regex: trigrams fully inside literal fragments
    * of the pattern (maximal runs of non-metacharacter literals). A match
    * must contain every such fragment as a substring, hence its trigrams —
    * the conservative core of Cox's RegexpQuery→trigram translation.
    * Escapes and classes end a fragment (conservative: contributes
    * nothing rather than something wrong). */
  def regexLiteralTrigrams(pattern: String): Seq[String] = {
    if (pattern.indexOf('|') >= 0) return Nil // alternation: nothing is required
    val frags = scala.collection.mutable.ArrayBuffer.empty[String]
    // (frags.length at '(', discard-contents?) per open group. A group's
    // fragments are discarded when the group itself is optional ('(…)?',
    // '(…)*', '(…){…}') or is a non-(?:) special group (lookarounds,
    // inline flags): negative lookahead content is NOT required, and
    // being conservative here only loses pruning, never correctness.
    val groups = scala.collection.mutable.ArrayBuffer.empty[(Int, Boolean)]
    val cur = new StringBuilder
    def push(): Unit = { if (cur.nonEmpty) frags += cur.toString; cur.clear() }
    var i = 0
    while (i < pattern.length) {
      pattern.charAt(i) match {
        case '[' => // character class: contributes nothing; skip to its ']'
          push()
          i += 1
          if (i < pattern.length && pattern.charAt(i) == '^') i += 1
          if (i < pattern.length && pattern.charAt(i) == ']') i += 1 // literal ] first
          while (i < pattern.length && pattern.charAt(i) != ']') {
            if (pattern.charAt(i) == '\\') i += 1
            i += 1
          }
        case '\\' => // escaped char / class shorthand: conservatively nothing
          push(); i += 1
        case '?' | '*' =>
          // preceding unit optional: its char is not required, and
          // adjacency across the quantifier is broken
          if (cur.nonEmpty) cur.setLength(cur.length - 1)
          push()
        case '{' => // counted quantifier: treat like '?'; skip to '}'
          if (cur.nonEmpty) cur.setLength(cur.length - 1)
          push()
          while (i < pattern.length && pattern.charAt(i) != '}') i += 1
        case '+' => // ≥1 repeat: char itself required, adjacency after it broken
          push()
        case '(' =>
          push()
          var discard = false
          if (i + 1 < pattern.length && pattern.charAt(i + 1) == '?') {
            i += 1 // the group-type '?' is a metachar, not a quantifier
            if (i + 1 < pattern.length && pattern.charAt(i + 1) == ':') i += 1
            else discard = true // lookaround / flags / named: drop contents
          }
          groups += ((frags.length, discard))
        case ')' =>
          push()
          val (mark, discard) =
            if (groups.nonEmpty) groups.remove(groups.length - 1) else (0, false)
          val quantified = i + 1 < pattern.length &&
            "?*{".indexOf(pattern.charAt(i + 1)) >= 0
          if (discard || quantified)
            frags.remove(mark, frags.length - mark)
          // a following '?'/'*' then sees empty cur (no-op); '{' skips to '}'
        case '.' | '^' | '$' =>
          push()
        case c =>
          cur.append(c)
      }
      i += 1
    }
    push()
    frags.toSeq.filter(_.length >= 3).flatMap(trigramsOf).distinct
  }

  /** Exact regex search over the stored text: required-trigram candidates
    * (when the pattern yields any), then verify with `rlike`. Patterns with
    * no ≥3-char literal fragment fall back to a full verify scan. */
  def regexSearch(docs: DataFrame, blocks: DataFrame, stats: Map[String, Long],
                  pattern: String, idCol: String = "doc_id",
                  textCol: String = "text", rarestK: Int = 8): DataFrame = {
    val tris = regexLiteralTrigrams(pattern)
    val base =
      if (tris.isEmpty) docs
      else {
        val known = tris.filter(t => stats.getOrElse(t, 0L) > 0L)
        if (known.size < tris.size)
          return docs.select(col(idCol).cast("long").as("doc_id")).limit(0)
        val chosen = tris.sortBy(t => (stats(t), t)).take(rarestK)
        val cand = candidates(blocks, chosen).withColumnRenamed("doc_id", "cand_id")
        docs.join(cand, docs(idCol).cast("int") === col("cand_id")).drop("cand_id")
      }
    base.filter(col(textCol).rlike(pattern))
      .select(docs(idCol).cast("long").as("doc_id"))
  }
}
