package graft.core

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3), 1980 — public), as the `english_stemmer`
  * analog of the reference's ES analyzer chain
  * (`scripts/tokenize_wiki_linedoc.py:21-57`).
  *
  * Two deliberate, documented choices:
  *  - classic Porter (the published 1980 rules), not the later Porter2
  *    revision ES's "english" name resolves to — the classic rule set is
  *    fully specified in the public paper and reproducible in BOTH engines;
  *  - `y` is classified a vowel iff it is not word-initial and the
  *    PRECEDING CHARACTER is not in [aeiou] (the paper classifies by the
  *    preceding character's resolved class, which differs only inside `yy`
  *    runs — absent from real vocabularies; this form is expressible as a
  *    fixed regexp_replace chain for the SQL oracle).
  *
  * Every step is mirrored by a DuckDB SQL generator ([[sqlSteps]]) built
  * from the SAME rule tables, so the graded oracle replays stemming
  * character-for-character from one definition (the `triCandSql` pattern).
  */
object Porter {

  private val AEIOU = Set('a', 'e', 'i', 'o', 'u')

  /** Vowel/consonant map: 'V'/'C' per char (see y rule in the object doc). */
  def vcMap(s: String): String = {
    val out = new Array[Char](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      out(i) =
        if (AEIOU(c)) 'V'
        else if (c == 'y' && i > 0 && !AEIOU(s.charAt(i - 1))) 'V'
        else 'C'
      i += 1
    }
    new String(out)
  }

  /** The measure m: number of V→C transitions in the map. */
  def measure(s: String): Int = {
    val m = vcMap(s)
    var n = 0
    var i = 1
    while (i < m.length) {
      if (m.charAt(i - 1) == 'V' && m.charAt(i) == 'C') n += 1
      i += 1
    }
    n
  }

  def hasVowel(s: String): Boolean = vcMap(s).indexOf('V') >= 0

  /** *d — ends with a double consonant. */
  private def endsDoubleC(s: String): Boolean =
    s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2) &&
      vcMap(s).endsWith("CC")

  /** *o — ends cvc where the final c is not w, x or y. */
  private def endsCvc(s: String): Boolean =
    s.length >= 3 && vcMap(s).endsWith("CVC") &&
      !Set('w', 'x', 'y')(s.charAt(s.length - 1))

  // (suffix, replacement) tables shared by the evaluator and the SQL
  // generator; within a step the FIRST matching suffix wins (ordered
  // longest-first, the paper's longest-match rule), and a failed condition
  // leaves the word unchanged — no fall-through to shorter suffixes.
  private[core] val Step2Rules: Seq[(String, String)] = Seq(
    "ational" -> "ate", "ization" -> "ize", "iveness" -> "ive",
    "fulness" -> "ful", "ousness" -> "ous", "tional" -> "tion",
    "biliti" -> "ble", "entli" -> "ent", "ousli" -> "ous", "ation" -> "ate",
    "alism" -> "al", "aliti" -> "al", "iviti" -> "ive", "enci" -> "ence",
    "anci" -> "ance", "izer" -> "ize", "abli" -> "able", "alli" -> "al",
    "ator" -> "ate", "eli" -> "e")
  private[core] val Step3Rules: Seq[(String, String)] = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ness" -> "", "ful" -> "")
  private[core] val Step4Suffixes: Seq[String] = Seq(
    "ement", "ance", "ence", "able", "ible", "ment", "ion", "ant", "ent",
    "ism", "ate", "iti", "ous", "ive", "ize", "al", "er", "ic", "ou")

  private def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) w.dropRight(1)
    else w

  private def step1bFix(s: String): String =
    if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
    else if (endsDoubleC(s) && !Set('l', 's', 'z')(s.charAt(s.length - 1)))
      s.dropRight(1)
    else if (measure(s) == 1 && endsCvc(s)) s + "e"
    else s

  private def step1b(w: String): String =
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w.dropRight(1) else w
    } else if (w.endsWith("ed")) {
      val s = w.dropRight(2)
      if (hasVowel(s)) step1bFix(s) else w
    } else if (w.endsWith("ing")) {
      val s = w.dropRight(3)
      if (hasVowel(s)) step1bFix(s) else w
    } else w

  private def step1c(w: String): String =
    if (w.endsWith("y") && hasVowel(w.dropRight(1))) w.dropRight(1) + "i" else w

  private def mapStep(w: String, rules: Seq[(String, String)]): String =
    rules.find { case (suf, _) => w.endsWith(suf) } match {
      case Some((suf, rep)) =>
        val s = w.dropRight(suf.length)
        if (measure(s) > 0) s + rep else w
      case None => w
    }

  private def step4(w: String): String =
    Step4Suffixes.find(w.endsWith) match {
      case Some(suf) =>
        val s = w.dropRight(suf.length)
        val extra = suf != "ion" || (s.nonEmpty &&
          (s.charAt(s.length - 1) == 's' || s.charAt(s.length - 1) == 't'))
        if (measure(s) > 1 && extra) s else w
      case None => w
    }

  private def step5a(w: String): String =
    if (w.endsWith("e")) {
      val s = w.dropRight(1)
      val m = measure(s)
      if (m > 1 || (m == 1 && !endsCvc(s))) s else w
    } else w

  private def step5b(w: String): String =
    if (w.endsWith("ll") && measure(w) > 1) w.dropRight(1) else w

  /** Stem a lowercase word. Words of length <= 2 pass unchanged. */
  def stem(w: String): String =
    if (w.length <= 2) w
    else step5b(step5a(step4(mapStep(mapStep(
      step1c(step1b(step1a(w))), Step2Rules), Step3Rules))))

  // ---------------- DuckDB SQL generator (same rules) ----------------

  /** vcMap as a regexp_replace chain — exactly the y rule above:
    * vowels → V; y after a V marker → C (left-to-right, non-overlapping,
    * which reproduces the literal-preceding-character rule); leading
    * y → C; remaining y → V; everything else → C. */
  private def vcSql(e: String): String =
    s"regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
      s"regexp_replace($e, '[aeiou]', 'V', 'g'), 'Vy', 'VC', 'g'), " +
      s"'^y', 'C'), 'y', 'V', 'g'), '[^VC]', 'C', 'g')"
  private def mSql(e: String): String =
    s"len(regexp_extract_all(${vcSql(e)}, 'VC'))"
  private def hasVowelSql(e: String): String = s"${vcSql(e)} LIKE '%V%'"
  private def endsDoubleCSql(e: String): String =
    s"(right($e, 1) = substr($e, len($e) - 1, 1) AND ${vcSql(e)} LIKE '%CC')"
  private def endsCvcSql(e: String): String =
    s"(${vcSql(e)} LIKE '%CVC' AND right($e, 1) NOT IN ('w', 'x', 'y'))"
  private def drop(e: String, n: Int): String = s"substr($e, 1, len($e) - $n)"

  private def step1aSql(w: String): String =
    s"""CASE WHEN $w LIKE '%sses' THEN ${drop(w, 2)}
       | WHEN $w LIKE '%ies' THEN ${drop(w, 2)}
       | WHEN $w LIKE '%ss' THEN $w
       | WHEN $w LIKE '%s' THEN ${drop(w, 1)}
       | ELSE $w END""".stripMargin

  private def fixSql(s: String): String =
    s"""CASE WHEN $s LIKE '%at' OR $s LIKE '%bl' OR $s LIKE '%iz' THEN $s || 'e'
       | WHEN ${endsDoubleCSql(s)} AND right($s, 1) NOT IN ('l', 's', 'z')
       |   THEN ${drop(s, 1)}
       | WHEN ${mSql(s)} = 1 AND ${endsCvcSql(s)} THEN $s || 'e'
       | ELSE $s END""".stripMargin

  private def step1bSql(w: String): String =
    s"""CASE WHEN $w LIKE '%eed' THEN
       |   (CASE WHEN ${mSql(drop(w, 3))} > 0 THEN ${drop(w, 1)} ELSE $w END)
       | WHEN $w LIKE '%ed' AND ${hasVowelSql(drop(w, 2))} THEN ${fixSql(drop(w, 2))}
       | WHEN $w LIKE '%ing' AND ${hasVowelSql(drop(w, 3))} THEN ${fixSql(drop(w, 3))}
       | ELSE $w END""".stripMargin

  private def step1cSql(w: String): String =
    s"""CASE WHEN $w LIKE '%y' AND ${hasVowelSql(drop(w, 1))}
       | THEN ${drop(w, 1)} || 'i' ELSE $w END""".stripMargin

  private def mapStepSql(w: String, rules: Seq[(String, String)]): String = {
    val whens = rules.map { case (suf, rep) =>
      val s = drop(w, suf.length)
      s"WHEN $w LIKE '%$suf' THEN (CASE WHEN ${mSql(s)} > 0 THEN $s || '$rep' ELSE $w END)"
    }
    s"CASE ${whens.mkString("\n ")} ELSE $w END"
  }

  private def step4Sql(w: String): String = {
    val whens = Step4Suffixes.map { suf =>
      val s = drop(w, suf.length)
      val extra =
        if (suf == "ion") s" AND right($s, 1) IN ('s', 't')" else ""
      s"WHEN $w LIKE '%$suf' THEN (CASE WHEN ${mSql(s)} > 1$extra THEN $s ELSE $w END)"
    }
    s"CASE ${whens.mkString("\n ")} ELSE $w END"
  }

  private def step5aSql(w: String): String = {
    val s = drop(w, 1)
    s"""CASE WHEN $w LIKE '%e' AND (${mSql(s)} > 1 OR
       |   (${mSql(s)} = 1 AND NOT ${endsCvcSql(s)})) THEN $s ELSE $w END""".stripMargin
  }

  private def step5bSql(w: String): String =
    s"""CASE WHEN $w LIKE '%ll' AND ${mSql(w)} > 1 THEN ${drop(w, 1)}
       | ELSE $w END""".stripMargin

  /** The per-step SQL expressions over a token column named `col` — the
    * oracle chains them as CTEs (one SELECT per step, `length <= 2` words
    * passed through by the caller's guard). */
  def sqlSteps(col: String): Seq[String] = Seq(
    step1aSql(col), step1bSql(col), step1cSql(col),
    mapStepSql(col, Step2Rules), mapStepSql(col, Step3Rules),
    step4Sql(col), step5aSql(col), step5bSql(col))

  /** Full stem as chained subselects over `innerSql` (which must expose
    * `tokCol` plus `carryCols`). The length <= 2 passthrough is applied
    * ONCE on the ORIGINAL token (the paper's entry guard — intermediates
    * may legally shrink below 3 and still continue through later steps). */
  def sqlStemQuery(innerSql: String, tokCol: String,
                   carryCols: Seq[String]): String = {
    val carry = carryCols.mkString(", ")
    val seeded =
      s"(SELECT $carry, $tokCol AS __tok0, $tokCol FROM ($innerSql))"
    val chained = sqlSteps(tokCol).foldLeft(seeded) { (src, step) =>
      s"(SELECT $carry, __tok0, ($step) AS $tokCol FROM $src)"
    }
    s"""SELECT $carry, CASE WHEN len(__tok0) <= 2 THEN __tok0 ELSE $tokCol END AS $tokCol
       |FROM $chained""".stripMargin
  }
}
