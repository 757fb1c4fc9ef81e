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

  // ---- analyzer folding (reference chain `tokenize_wiki_linedoc.py:27-47`:
  // `asciifolding` + `html_strip`) ----

  /** Accented-latin → ASCII folding pairs (the Latin-1 Supplement and
    * Latin Extended-A subset of Lucene's public ASCIIFoldingFilter
    * mapping; lowercase keys only — [[tokenizeText]] lowercases first).
    * One table drives BOTH the Scala fold and the generated SQL twin
    * ([[sqlFoldExpr]]), so engine/oracle parity is structural. */
  val FoldPairs: Seq[(Char, String)] = {
    val one = Seq(
      "àáâãäåāăą" -> "a", "çćĉċč" -> "c", "èéêëēĕėęě" -> "e",
      "ìíîïĩīĭįı" -> "i", "ñńņňŉ" -> "n", "òóôõöøōŏő" -> "o",
      "ùúûüũūŭůűų" -> "u", "ýÿŷ" -> "y", "ďđð" -> "d", "ĝğġģ" -> "g",
      "ĥħ" -> "h", "ĵ" -> "j", "ķ" -> "k", "ĺļľŀł" -> "l", "ŕŗř" -> "r",
      "śŝşš" -> "s", "ţťŧ" -> "t", "ŵ" -> "w", "źżž" -> "z")
    val multi = Seq('æ' -> "ae", 'œ' -> "oe", 'ß' -> "ss", 'þ' -> "th",
      'ĳ' -> "ij")
    one.flatMap { case (ks, v) => ks.map(_ -> v) } ++ multi
  }
  private val foldMap: Map[Char, String] = FoldPairs.toMap

  /** Fold accented latin chars to ASCII ([[FoldPairs]]); unmapped chars
    * pass through. */
  def foldAscii(s: String): String = {
    var i = 0
    var changed = false
    while (i < s.length && !changed) { changed = foldMap.contains(s.charAt(i)); i += 1 }
    if (!changed) return s
    val b = new java.lang.StringBuilder(s.length + 2)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      foldMap.get(c) match {
        case Some(r) => b.append(r)
        case None    => b.append(c)
      }
      i += 1
    }
    b.toString
  }

  /** Generated-SQL twin of [[foldAscii]] over a column expression: one
    * `translate` for the 1:1 pairs plus a `replace` chain for the
    * multi-char foldings — the DuckDB oracle replays the SAME table. */
  def sqlFoldExpr(col: String): String = {
    val (multi, one) = FoldPairs.partition(_._2.length > 1)
    val from = one.map(_._1).mkString
    val to = one.map(_._2).mkString
    multi.foldLeft(s"translate($col, '$from', '$to')") { case (e, (k, v)) =>
      s"replace($e, '$k', '$v')"
    }
  }

  /** Named HTML entities decoded by [[stripHtml]] (lowercase names: the
    * HTML-4 core set plus the Latin-1 letter entities the fold table
    * covers). `amp` must decode LAST — see [[stripHtml]]. */
  val HtmlEntities: Seq[(String, String)] = {
    val latin1 = Seq(
      "agrave" -> "à", "aacute" -> "á", "acirc" -> "â", "atilde" -> "ã",
      "auml" -> "ä", "aring" -> "å", "aelig" -> "æ", "ccedil" -> "ç",
      "egrave" -> "è", "eacute" -> "é", "ecirc" -> "ê", "euml" -> "ë",
      "igrave" -> "ì", "iacute" -> "í", "icirc" -> "î", "iuml" -> "ï",
      "ntilde" -> "ñ", "ograve" -> "ò", "oacute" -> "ó", "ocirc" -> "ô",
      "otilde" -> "õ", "ouml" -> "ö", "oslash" -> "ø", "ugrave" -> "ù",
      "uacute" -> "ú", "ucirc" -> "û", "uuml" -> "ü", "yacute" -> "ý",
      "szlig" -> "ß", "thorn" -> "þ", "eth" -> "ð", "oelig" -> "œ")
    val core = Seq("lt" -> "<", "gt" -> ">", "quot" -> "\"",
      "apos" -> "'", "nbsp" -> " ")
    // amp strictly last so "&amp;lt;" decodes ONCE (to "&lt;"), exactly
    // like the generated replace chain
    (latin1 ++ core).sortBy(_._1) :+ ("amp" -> "&")
  }

  /** HTML char filter (ES `html_strip` analog, token-level semantics):
    * every `<...>` span (up to the NEXT `>`; an unclosed `<` stays
    * literal — the exact semantics of the twin's `<[^>]*>` regex) becomes
    * one space, then the named entities of [[HtmlEntities]] decode in
    * table order. Runs BEFORE tokenization (a char filter), so token
    * offsets index the STRIPPED text, not the raw markup — callers that
    * slice by offset must slice the same stripped string. Numeric
    * entities (`&#233;`) are NOT decoded (both engine and oracle leave
    * them; their `&`/`#`/`;` are token breaks either way). */
  def stripHtml(text: String): String = {
    var out = {
      val b = new java.lang.StringBuilder(text.length)
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        if (c == '<') {
          val close = text.indexOf('>', i + 1)
          if (close >= 0) { b.append(' '); i = close + 1 }
          else { b.append(c); i += 1 }
        } else { b.append(c); i += 1 }
      }
      b.toString
    }
    HtmlEntities.foreach { case (name, v) => out = out.replace(s"&$name;", v) }
    out
  }

  /** Generated-SQL twin of [[stripHtml]]: tag strip as a regexp, then the
    * SAME entity table as a replace chain (same order, `amp` last). */
  def sqlStripHtmlExpr(col: String): String =
    HtmlEntities.foldLeft(s"regexp_replace($col, '<[^>]*>', ' ', 'g')") {
      case (e, (name, v)) =>
        val lit = v.replace("'", "''")
        s"replace($e, '&$name;', '$lit')"
    }

  /** Natural-language analyzer (opt-in; mirrors the reference's ES chain
    * `tokenize_wiki_linedoc.py:21-57`: possessive stemmer → lowercase →
    * english stop → english stemmer). Token chars additionally include
    * `'` so possessives survive tokenization; each token then drops a
    * trailing `'s` and any remaining apostrophes, stopwords are removed
    * (their POSITIONS remain consumed — Lucene position-increment
    * semantics, so phrase adjacency across a removed stopword does NOT
    * collapse), and survivors are Porter-stemmed ([[Porter]]). Doc length
    * (the BM25 norm) = SURVIVING token count, Lucene's norm rule. */
  def tokenizeText(text: String): Array[Token] = tokenizeText(text, fold = false)

  /** [[tokenizeText]] with opt-in `asciifolding` (reference chain
    * `tokenize_wiki_linedoc.py:27-47`). With `fold = true` the token
    * alphabet additionally accepts the [[FoldPairs]] accented letters,
    * and each surviving term folds to ASCII BEFORE stemming — the ES
    * chain lists folding after the stemmer, but stemming the folded form
    * keeps Porter's rule tables ASCII-pure and lets the SQL twin replay
    * fold∘stem literally (documented deviation; on s-plurals like
    * "cafés" the two orders agree). Stopword removal stays PRE-fold, so
    * "thé" is not dropped (it folds and indexes as "the", exactly ES's
    * outcome). HTML stripping is a char filter — apply [[stripHtml]] to
    * the text before calling (offsets then index the stripped string). */
  def tokenizeText(text: String, fold: Boolean): Array[Token] = {
    val lower = text.toLowerCase
    val out = scala.collection.mutable.ArrayBuilder.make[Token]
    @inline def wordChar(c: Char): Boolean =
      isTextWordChar(c) || (fold && foldMap.contains(c))
    var i = 0
    var pos = 0
    val n = lower.length
    while (i < n) {
      while (i < n && !wordChar(lower.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && wordChar(lower.charAt(i))) i += 1
        val raw = lower.substring(start, i)
        val dePoss = if (raw.endsWith("'s")) raw.dropRight(2) else raw
        val term = dePoss.replace("'", "")
        if (term.nonEmpty && !EnglishStopWords.contains(term)) {
          val folded = if (fold) foldAscii(term) else term
          out += Token(Porter.stem(folded), pos, start, i)
        }
        pos += 1 // removed tokens still consume their position
      }
    }
    out.result()
  }

  /** [[grouped]] under the text analyzer ([[tokenizeText]]). */
  def groupedText(text: String, fold: Boolean = false)
      : Array[(String, Array[Int], Array[(Int, Int)])] =
    groupTokens(tokenizeText(text, fold))

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
