package graft.query

import graft.core.Tokenizer
import org.apache.spark.sql.DataFrame

/** Query-log input — the reference's query pool format
  * (`query_pool.h:299-311`): one query per line, whitespace-separated
  * terms, a line wrapped in double quotes is a PHRASE query. Blank lines
  * and `#` comments are skipped. Terms are normalized through the engine
  * tokenizer so log text and index vocabulary always agree.
  */
object QueryLog {

  final case class LogQuery(id: Int, terms: Seq[String], phrase: Boolean)

  /** Parse one log line (None for blanks/comments). */
  def parseLine(line: String, id: Int): Option[LogQuery] = {
    val t = line.trim
    if (t.isEmpty || t.startsWith("#")) None
    else if (t.length >= 2 && t.startsWith("\"") && t.endsWith("\""))
      Some(LogQuery(id, Tokenizer.terms(t.substring(1, t.length - 1)).toSeq, phrase = true))
    else Some(LogQuery(id, Tokenizer.terms(t).toSeq, phrase = false))
  }

  /** Load a query log from a local file (driver-side — logs are the small
    * side of the workload; ids are line numbers of non-empty lines). */
  def load(path: String): Seq[LogQuery] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path)).asScala
      .toSeq.zipWithIndex
      .flatMap { case (l, i) => parseLine(l, i) }
      .filter(_.terms.nonEmpty)
  }

  /** Run a full log against an index: term queries go through the batched
    * [[Searcher.searchAll]] single-job path; phrase queries run through the
    * positional [[Searcher.search]] pipeline each (phrase evaluation is a
    * multi-stage job of its own). Returns (queryId, rank, docId, score). */
  def run(ix: Searcher.LoadedIndex, queries: Seq[LogQuery], k: Int): DataFrame = {
    import ix.spark.implicits._
    import org.apache.spark.sql.functions.lit
    val termQs = queries.filter(!_.phrase).map(q => (q.id, q.terms))
    val phraseQs = queries.filter(_.phrase)
    val batched: Option[DataFrame] =
      if (termQs.nonEmpty) Some(Searcher.searchAll(ix, termQs, k)) else None
    val phrased: Seq[DataFrame] = phraseQs.map { q =>
      Searcher.search(ix, q.terms, k, phrase = true)
        .toDF("docId", "score", "rank")
        .select(lit(q.id).as("queryId"), $"rank", $"docId", $"score")
    }
    (batched.toSeq ++ phrased) match {
      case Nil => Seq.empty[(Int, Int, Int, Double)].toDF("queryId", "rank", "docId", "score")
      case head :: tail => tail.foldLeft(head)(_ unionByName _)
    }
  }
}
