package graft.core

/** Single-JVM reference oracle: a direct, small port of the reference
  * engine's query-processing semantics, used for differential testing of the
  * distributed Spark pipeline (mirrors the reference's own engine-vs-engine
  * differential tests, `tests_15.cc:158-211`).
  *
  * Semantics ported (reference `src/qq_mem/src/query_processing.h`):
  *  - conjunctive k-way posting-list intersection by max-pivot leapfrog
  *    (`ProcessMultipleTerms` `query_processing.h:710-728,810-852`)
  *  - phrase match: adjusted-position leapfrog within a matched doc
  *    (`PhraseQueryProcessor2` `query_processing.h:282-362`)
  *  - lossy BM25 doc score (`CalcDocScoreLossy` `scoring.h:124-145`)
  *  - bounded min-heap top-k: insert while size<k, then replace root only on
  *    strictly greater score (`query_processing.h:914-932`) — with candidates
  *    visited in ascending docId, the surviving set equals top-k by
  *    (score desc, docId asc); we emit that order (SURVEY.md §8.4 pragmatic
  *    tie rule, adopted engine-wide).
  */
object Oracle {

  final case class Doc(docId: Int, content: String)
  final case class Hit(docId: Int, score: Double)

  final class Index private (
      val docs: Seq[Doc],
      /** term -> postings sorted by docId: (docId, tf, positions) */
      val postings: Map[String, Array[(Int, Int, Array[Int])]],
      val docLen: Map[Int, Int]) {

    def this(docs: Seq[Doc], textAnalyzer: Boolean = false) = this(
      docs,
      Index.buildPostings(docs, textAnalyzer),
      docs.map(d => d.docId -> (
        if (textAnalyzer) Tokenizer.tokenizeText(d.content).length
        else Tokenizer.terms(d.content).length)).toMap)

    val nDocs: Long = docLen.size.toLong
    val avgLen: Double = if (nDocs == 0) 0.0 else docLen.values.map(_.toLong).sum.toDouble / nDocs
    val lossyCache: Array[Double] = Bm25.lossyCache(avgLen)
    def df(term: String): Long = postings.get(term).map(_.length.toLong).getOrElse(0L)
  }

  object Index {
    private def buildPostings(docs: Seq[Doc], textAnalyzer: Boolean)
        : Map[String, Array[(Int, Int, Array[Int])]] = {
      val m = scala.collection.mutable.HashMap
        .empty[String, scala.collection.mutable.ArrayBuffer[(Int, Int, Array[Int])]]
      docs.sortBy(_.docId).foreach { d =>
        val grouped =
          if (textAnalyzer) Tokenizer.groupedText(d.content) else Tokenizer.grouped(d.content)
        grouped.foreach { case (term, ps, _) =>
          m.getOrElseUpdate(term, scala.collection.mutable.ArrayBuffer.empty) +=
            ((d.docId, ps.length, ps))
        }
      }
      m.view.mapValues(_.toArray).toMap
    }

    /** Index from PRE-ANALYZED per-doc term groups + externally-defined
      * doc lengths — the reference's linedoc ingestion shape
      * (`qq_mem_engine.h:194-215`): the file carries the analyzed stream,
      * the BM25 norm is `BodyLength()` (whitespace terms of the raw
      * body), and no tokenizer runs at all. */
    def fromGroups(perDoc: Seq[(Int, Seq[(String, Array[Int])])],
                   lens: Map[Int, Int]): Index = {
      val m = scala.collection.mutable.HashMap
        .empty[String, scala.collection.mutable.ArrayBuffer[(Int, Int, Array[Int])]]
      perDoc.sortBy(_._1).foreach { case (docId, groups) =>
        groups.foreach { case (term, ps) =>
          m.getOrElseUpdate(term, scala.collection.mutable.ArrayBuffer.empty) +=
            ((docId, ps.length, ps))
        }
      }
      new Index(Nil, m.view.mapValues(_.toArray).toMap, lens)
    }
  }

  /** Conjunctive (optionally phrase) BM25 top-k. Empty if any term missing
    * (`qq_mem_engine.h:345-347`).
    *
    * `excludeTerms` completes the Boolean set-operator family (the reference
    * declares only AND; OR/NOT are natural closures — Lucene MUST_NOT
    * semantics): a doc containing ANY excluded term is dropped from the
    * candidate set, and excluded terms never contribute to the score. */
  def search(ix: Index, queryTerms: Seq[String], k: Int, phrase: Boolean = false,
             excludeTerms: Seq[String] = Nil, slop: Int = 0,
             boosts: Map[String, Double] = Map.empty,
             phraseShifts: Option[Seq[Int]] = None): Seq[Hit] = {
    if (queryTerms.isEmpty || k <= 0) return Nil
    val lists = queryTerms.map(t => ix.postings.getOrElse(t, return Nil))
    // query-time term boost (Lucene `term^B`; absent in the reference, whose
    // SearchQuery has no per-term weight — a natural completion): each
    // slot's weight is the driver-side double idf·B, then ·tfNorm — the
    // same association order on every path, so scores stay bitwise-equal
    val idfs = queryTerms.map(t =>
      Bm25.idf(ix.nDocs, ix.df(t)) * boosts.getOrElse(t, 1.0))
    val excluded: Set[Int] = excludeTerms.distinct.iterator
      .flatMap(t => ix.postings.getOrElse(t, Array.empty[(Int, Int, Array[Int])]))
      .map(_._1).toSet

    // k-way max-pivot leapfrog over docId-sorted lists
    val cursors = Array.fill(lists.size)(0)
    val hits = scala.collection.mutable.ArrayBuffer.empty[Hit]
    var done = false
    while (!done) {
      var maxDoc = -1
      var allAligned = true
      var i = 0
      while (i < lists.size && !done) {
        if (cursors(i) >= lists(i).length) done = true
        else {
          val d = lists(i)(cursors(i))._1
          if (maxDoc == -1) maxDoc = d
          else if (d != maxDoc) { allAligned = false; if (d > maxDoc) maxDoc = d }
        }
        i += 1
      }
      if (!done) {
        if (allAligned) {
          val docId = maxDoc
          val matches = !excluded.contains(docId) &&
            (!phrase || {
              val posLists = lists.indices.map(j => lists(j)(cursors(j))._3)
              if (slop != 0) proximityMatch(posLists, slop)
              else phraseShifts match {
                case Some(sh) => phraseMatchAt(posLists, sh) // stopword gaps
                case None     => phraseMatch(posLists)
              }
            })
          if (matches) {
            val lenByte = LenByte.encode(ix.docLen(docId).toLong)
            var score = 0.0
            var j = 0
            while (j < lists.size) {
              score += idfs(j) * Bm25.tfNormLossy(lists(j)(cursors(j))._2.toLong, lenByte, ix.lossyCache)
              j += 1
            }
            hits += Hit(docId, score)
          }
          var j = 0
          while (j < lists.size) { cursors(j) += 1; j += 1 }
        } else {
          // skip-forward all lists to maxDoc (galloping not needed at oracle scale)
          var j = 0
          while (j < lists.size) {
            while (cursors(j) < lists(j).length && lists(j)(cursors(j))._1 < maxDoc) cursors(j) += 1
            j += 1
          }
        }
      }
    }
    topK(hits, k)
  }

  /** Disjunctive BM25 top-k. The reference DECLARES `SearchOperator::OR`
    * (`types.h:70`) but never implements it in the C++ engine; semantics
    * completed here: score = sum over query slots whose term contains the
    * doc (slot order, so the FP sequence is deterministic), absent terms
    * contribute nothing, all-terms-absent => empty. */
  def searchOr(ix: Index, queryTerms: Seq[String], k: Int,
               excludeTerms: Seq[String] = Nil): Seq[Hit] = {
    if (k <= 0) return Nil
    val present = queryTerms.filter(ix.postings.contains)
    if (present.isEmpty) return Nil
    val excluded: Set[Int] = excludeTerms.distinct.iterator
      .flatMap(t => ix.postings.getOrElse(t, Array.empty[(Int, Int, Array[Int])]))
      .map(_._1).toSet
    val acc = scala.collection.mutable.LinkedHashMap.empty[Int, Double]
    // slot-outer iteration: every doc's contributions accumulate in query
    // slot order — same FP order as a per-doc slot loop
    present.foreach { t =>
      val idf = Bm25.idf(ix.nDocs, ix.df(t))
      ix.postings(t).foreach { case (docId, tf, _) =>
        if (!excluded.contains(docId)) {
          val lenByte = LenByte.encode(ix.docLen(docId).toLong)
          val part = idf * Bm25.tfNormLossy(tf.toLong, lenByte, ix.lossyCache)
          acc.update(docId, acc.getOrElse(docId, 0.0) + part)
        }
      }
    }
    // topK's boundary tie rule assumes candidates in ascending docId
    topK(acc.iterator.map { case (d, s) => Hit(d, s) }.toSeq.sortBy(_.docId), k)
  }

  /** Adjusted-position leapfrog: term i's positions shifted by -i must
    * intersect (`query_processing.h:335-362`). Returns true if the phrase
    * occurs at least once. */
  def phraseMatch(positionLists: Seq[Array[Int]]): Boolean =
    phraseMatchStarts(positionLists).nonEmpty

  /** Every start position where the phrase occurs, ascending — slot i's
    * matching appearance sits at `start + i`. This is the position table
    * the reference keeps per result for phrase highlighting
    * (`query_processing.h:365-392` AppendPositionCol). */
  def phraseMatchStarts(positionLists: Seq[Array[Int]]): Array[Int] = {
    if (positionLists.isEmpty) return Array.empty
    if (positionLists.size == 1) return positionLists.head.clone().sorted
    var candidates: Set[Int] = positionLists.head.toSet
    var i = 1
    while (i < positionLists.size && candidates.nonEmpty) {
      val shifted = positionLists(i).iterator.map(_ - i).toSet
      candidates = candidates.intersect(shifted)
      i += 1
    }
    candidates.toArray.sorted
  }

  /** [[phraseMatch]] with EXPLICIT per-slot position shifts — the
    * query-side position increments Lucene's `match_phrase` keeps when an
    * analyzer removes tokens (stopword gaps): slot i must appear at
    * `start + shifts(i)`. `shifts = 0..k-1` is plain adjacency; the base
    * is irrelevant (only differences matter). */
  def phraseMatchAt(positionLists: Seq[Array[Int]], shifts: Seq[Int]): Boolean = {
    require(positionLists.size == shifts.size, "one shift per slot")
    if (positionLists.isEmpty) return false
    if (positionLists.size == 1) return positionLists.head.nonEmpty
    var candidates: Set[Int] =
      positionLists.head.iterator.map(_ - shifts.head).toSet
    var i = 1
    while (i < positionLists.size && candidates.nonEmpty) {
      val shifted = positionLists(i).iterator.map(_ - shifts(i)).toSet
      candidates = candidates.intersect(shifted)
      i += 1
    }
    candidates.nonEmpty
  }

  /** Ordered proximity (Lucene span-near / `"a b"~N` slop analog; absent in
    * the reference, which only has exact adjacency): the query's slots must
    * occur in ORDER at strictly increasing positions p₁<…<p_k with total
    * span `p_k − p₁ ≤ (k−1) + slop`. `slop = 0` degenerates to exact
    * adjacency, i.e. [[phraseMatch]].
    *
    * Greedy minimal-chain scan: for each candidate start p₁ the smallest
    * ordered chain is built by advancing each later slot's cursor to the
    * first position strictly above the previous slot's pick — minimal p_k
    * for that p₁, hence minimal span. Cursors persist across starts
    * (chains are monotone in p₁), so the whole check is
    * O(Σ positions). */
  def proximityMatch(positionLists: Seq[Array[Int]], slop: Int): Boolean = {
    val k = positionLists.size
    if (k == 0) return false
    if (positionLists.exists(_.isEmpty)) return false
    if (k == 1) return true
    val window = (k - 1) + slop
    val idx = new Array[Int](k)
    val first = positionLists.head
    var ci = 0
    while (ci < first.length) {
      val p1 = first(ci)
      var prev = p1
      var i = 1
      while (i < k) {
        val arr = positionLists(i)
        var c = idx(i)
        while (c < arr.length && arr(c) <= prev) c += 1
        idx(i) = c
        if (c >= arr.length) return false // later p₁ only raises the bound
        prev = arr(c)
        i += 1
      }
      if (prev - p1 <= window) return true
      ci += 1
    }
    false
  }

  /** Bounded min-heap top-k with the deterministic tie rule.
    *
    * The reference inserts while size<k then replaces the root only on a
    * strictly greater score (`query_processing.h:914-932`); with candidates
    * fed in ascending docId this keeps, among equal-score docs at the
    * boundary, the earliest-seen (lowest docId) ones — i.e. the surviving
    * set is exactly top-k by (score desc, docId asc). We implement that
    * deterministic rule directly (SURVEY.md §8.4 pragmatic tie rule) so
    * oracle and distributed engine agree bit-for-bit even under ties.
    */
  def topK(candidates: Iterable[Hit], k: Int): Seq[Hit] = {
    val heap = scala.collection.mutable.PriorityQueue.empty[Hit](
      Ordering.by[Hit, (Double, Int)](h => (-h.score, h.docId))) // head = worst kept
    candidates.foreach { h =>
      if (heap.size < k) heap.enqueue(h)
      else {
        val worst = heap.head
        if (h.score > worst.score || (h.score == worst.score && h.docId < worst.docId)) {
          heap.dequeue(); heap.enqueue(h)
        }
      }
    }
    heap.toSeq.sortBy(h => (-h.score, h.docId))
  }
}
