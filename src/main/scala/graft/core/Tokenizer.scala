package graft.core

/** Deterministic code tokenizer.
  *
  * The reference's analyzer is an external Elasticsearch pipeline
  * (`scripts/tokenize_wiki_linedoc.py:21-57`), so tokenizer choice is ours;
  * engine parity (Spark vs oracle) is defined on identical tokenizer output.
  *
  * Rules (documented in FIXTURES.md §4): lowercase; split on `[^a-z0-9_]+`;
  * drop empty tokens. Positions are token indexes (0-based); offsets are
  * [start,end) char spans in the original string; doc length = total token
  * count (the BM25 length).
  *
  * The exact same semantics are expressed SQL-side for the DuckDB oracle as
  * `list_filter(regexp_split_to_array(lower(text),'[^a-z0-9_]+'), x<>'')`.
  */
object Tokenizer {

  final case class Token(term: String, position: Int, start: Int, end: Int)

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'

  /** All tokens in order, with positions and offsets. Single pass. */
  def tokenize(text: String): Array[Token] = {
    val lower = text.toLowerCase
    val out = scala.collection.mutable.ArrayBuilder.make[Token]
    var i = 0
    var pos = 0
    val n = lower.length
    while (i < n) {
      while (i < n && !isWordChar(lower.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && isWordChar(lower.charAt(i))) i += 1
        out += Token(lower.substring(start, i), pos, start, i)
        pos += 1
      }
    }
    out.result()
  }

  /** Just the term sequence (BM25 doc length = its size). */
  def terms(text: String): Array[String] = tokenize(text).map(_.term)

  /** Code-identifier subtoken split (see [[graft.ops.TextOps.subtokensCol]]
    * for the Column form): pinned two-regex transform — acronym│Word
    * boundary, then camel boundary — lowercase, split on non-alnum. */
  def subtokens(ident: String): Array[String] =
    ident.replaceAll("([A-Z]+)([A-Z][a-z])", "$1 $2")
      .replaceAll("([a-z0-9])([A-Z])", "$1 $2")
      .toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  /** [[grouped]] with the CODE analyzer: each token additionally posts its
    * case-derived subtokens AT THE SAME POSITION with the same offsets
    * (Lucene WordDelimiterGraphFilter's posInc=0 injection), so `bar`
    * matches `fooBar`/`foo_bar` docs and phrase positions stay those of
    * the original token stream. Subtokens are derived from the ORIGINAL
    * cased slice (the lowercasing tokenizer has already erased camel
    * boundaries in `term`); a subtoken equal to the token itself is not
    * re-posted. Doc length (BM25 norm) remains the ORIGINAL token count —
    * injected subtokens don't inflate it (documented deviation knob). */
  def groupedCode(text: String): Array[(String, Array[Int], Array[(Int, Int)])] = {
    val toks = tokenize(text)
    val order = scala.collection.mutable.LinkedHashMap
      .empty[String, (scala.collection.mutable.ArrayBuilder[Int],
                      scala.collection.mutable.ArrayBuilder.ofRef[(Int, Int)])]
    def add(term: String, pos: Int, start: Int, end: Int): Unit = {
      val (ps, os) = order.getOrElseUpdate(
        term,
        (scala.collection.mutable.ArrayBuilder.make[Int],
         new scala.collection.mutable.ArrayBuilder.ofRef[(Int, Int)]))
      ps += pos
      os += ((start, end))
    }
    toks.foreach { t =>
      add(t.term, t.position, t.start, t.end)
      val subs = subtokens(text.substring(t.start, t.end))
      subs.distinct.foreach { sub =>
        if (sub != t.term) add(sub, t.position, t.start, t.end)
      }
    }
    order.iterator.map { case (term, (ps, os)) => (term, ps.result(), os.result()) }.toArray
  }

  /** The ES `_english_` stop set (Lucene `EnglishAnalyzer` default —
    * public), used by the reference's analyzer chain
    * (`tokenize_wiki_linedoc.py:36-39`). */
  val EnglishStopWords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

  @inline private def isTextWordChar(c: Char): Boolean =
    isWordChar(c) || c == '\''

  /** Natural-language analyzer (opt-in; mirrors the reference's ES chain
    * `tokenize_wiki_linedoc.py:21-57`: possessive stemmer → lowercase →
    * english stop → english stemmer). Token chars additionally include
    * `'` so possessives survive tokenization; each token then drops a
    * trailing `'s` and any remaining apostrophes, stopwords are removed
    * (their POSITIONS remain consumed — Lucene position-increment
    * semantics, so phrase adjacency across a removed stopword does NOT
    * collapse), and survivors are Porter-stemmed ([[Porter]]). Doc length
    * (the BM25 norm) = SURVIVING token count, Lucene's norm rule. */
  def tokenizeText(text: String): Array[Token] = {
    val lower = text.toLowerCase
    val out = scala.collection.mutable.ArrayBuilder.make[Token]
    var i = 0
    var pos = 0
    val n = lower.length
    while (i < n) {
      while (i < n && !isTextWordChar(lower.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && isTextWordChar(lower.charAt(i))) i += 1
        val raw = lower.substring(start, i)
        val dePoss = if (raw.endsWith("'s")) raw.dropRight(2) else raw
        val term = dePoss.replace("'", "")
        if (term.nonEmpty && !EnglishStopWords.contains(term))
          out += Token(Porter.stem(term), pos, start, i)
        pos += 1 // removed tokens still consume their position
      }
    }
    out.result()
  }

  /** [[grouped]] under the text analyzer ([[tokenizeText]]). */
  def groupedText(text: String): Array[(String, Array[Int], Array[(Int, Int)])] =
    groupTokens(tokenizeText(text))

  /** Per-unique-term groups like the reference linedoc `WITH_POSITIONS`
    * format: term -> (tf, positions, offsets), terms in first-seen order.
    */
  def grouped(text: String): Array[(String, Array[Int], Array[(Int, Int)])] =
    groupTokens(tokenize(text))

  private def groupTokens(
      toks: Array[Token]): Array[(String, Array[Int], Array[(Int, Int)])] = {
    val order = scala.collection.mutable.LinkedHashMap
      .empty[String, (scala.collection.mutable.ArrayBuilder[Int],
                      scala.collection.mutable.ArrayBuilder.ofRef[(Int, Int)])]
    toks.foreach { t =>
      val (ps, os) = order.getOrElseUpdate(
        t.term,
        (scala.collection.mutable.ArrayBuilder.make[Int],
         new scala.collection.mutable.ArrayBuilder.ofRef[(Int, Int)]))
      ps += t.position
      os += ((t.start, t.end))
    }
    order.iterator.map { case (term, (ps, os)) => (term, ps.result(), os.result()) }.toArray
  }
}
