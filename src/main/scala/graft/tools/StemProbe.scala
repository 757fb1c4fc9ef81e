package graft.tools

import graft.core.Porter

/** Differential harness for the Porter SQL generator: prints
  * `word<TAB>stem` for a vocabulary (args or built-in edge list) and, with
  * `--sql`, the DuckDB query that must reproduce it (tools/stemcheck.py
  * executes both and diffs). */
object StemProbe {
  val EdgeWords: Seq[String] = Seq(
    "caresses", "ponies", "ties", "caress", "cats", "feed", "agreed",
    "plastered", "bled", "motoring", "sing", "conflated", "troubled",
    "sized", "hopping", "tanned", "falling", "hissing", "fizzed", "failing",
    "filing", "happy", "sky", "relational", "conditional", "rational",
    "valenci", "hesitanci", "digitizer", "conformabli", "radicalli",
    "differentli", "vileli", "analogousli", "vietnamization", "predication",
    "operator", "feudalism", "decisiveness", "hopefulness", "callousness",
    "formaliti", "sensitiviti", "sensibiliti", "triplicate", "formative",
    "formalize", "electriciti", "electrical", "hopeful", "goodness",
    "revival", "allowance", "inference", "airliner", "gyroscopic",
    "adjustable", "defensible", "irritant", "replacement", "adjustment",
    "dependent", "adoption", "homologou", "communism", "activate",
    "angulariti", "homologous", "effective", "bowdlerize", "probate",
    "rate", "cease", "controll", "roll", "ion", "ions", "s", "a", "ay",
    "ays", "eye", "eyes", "oed", "ied", "y", "by", "say", "days", "dies",
    "agree", "queries", "query", "tables", "table", "values", "value",
    "customers", "customer", "merges", "merge", "joins", "scanning",
    "windows", "sorted", "hashing", "lines", "es", "ing", "ed")

  def main(args: Array[String]): Unit = {
    val sqlMode = args.contains("--sql")
    val words =
      if (args.filterNot(_ == "--sql").nonEmpty) args.filterNot(_ == "--sql").toSeq
      else EdgeWords
    if (sqlMode) {
      val values = words.map(w => s"('${w.replace("'", "''")}')").mkString(", ")
      println(Porter.sqlStemQuery(
        s"SELECT tok AS __w, tok FROM (VALUES $values) v(tok)", "tok", Seq("__w")))
    } else {
      words.foreach(w => println(s"$w\t${Porter.stem(w)}"))
    }
  }
}
