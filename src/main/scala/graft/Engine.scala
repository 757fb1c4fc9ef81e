package graft

import graft.index.{Bloom, IndexBuilder, Manifest}
import graft.query.{Highlighter, Searcher}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing facade mirroring the reference's engine surface
  * (`SearchEngineServiceNew`: AddDocuments → Serialize / Load → Search,
  * `qq_mem_engine.h`, `vacuum_engine.h`; query/result shapes
  * `types.h:205-346`).
  *
  * {{{
  * val eng = Engine.build(spark, corpusDf, "/data/index")   // or Engine.load
  * val res = eng.search(Engine.SearchQuery(Seq("if", "return"), nResults = 10,
  *                                         returnSnippets = true))
  * }}}
  */
object Engine {

  /** `SearchQuery` analog (`types.h:205-256`). */
  final case class SearchQuery(
      terms: Seq[String],
      nResults: Int = 5,
      isPhrase: Boolean = false,
      returnSnippets: Boolean = false,
      nSnippetPassages: Int = 3)

  /** `SearchResultEntry` analog (`types.h:259-346`). */
  final case class ResultEntry(docId: Int, score: Double, snippet: String)
  final case class SearchResult(entries: Seq[ResultEntry], docFreqs: Map[String, Long])

  /** Build (or resume building) an index over a corpus
    * (repo, path, commit, lang, content[, sha256]) and open it. */
  def build(spark: SparkSession, corpus: DataFrame, indexDir: String,
            partitions: Int = 32, withBloom: Boolean = true): Engine = {
    val withSha =
      if (corpus.columns.contains("sha256")) corpus
      else corpus.withColumn("sha256",
        org.apache.spark.sql.functions.sha2(org.apache.spark.sql.functions.col("content"), 256))
    IndexBuilder.build(spark, withSha, indexDir, partitions)
    if (withBloom) Bloom.buildStage(spark, indexDir)
    load(spark, indexDir)
  }

  /** Open an existing index (snapshot manifest must be committed). */
  def load(spark: SparkSession, indexDir: String): Engine = {
    require(Manifest.isCommitted(indexDir, "postings"),
      s"no committed index at $indexDir")
    new Engine(Searcher.load(spark, indexDir))
  }
}

final class Engine private (val ix: Searcher.LoadedIndex) {
  import Engine._

  def nDocs: Long = ix.nDocs
  def avgDocLen: Double = ix.avgLen

  /** Per-term document frequencies (`PostinglistSizes` analog). */
  def docFreqs(terms: Seq[String]): Map[String, Long] = {
    import ix.spark.implicits._
    ix.termstats.filter(org.apache.spark.sql.functions.col("term").isin(terms.distinct: _*))
      .select("term", "df").as[(String, Long)].collect().toMap
  }

  def search(q: SearchQuery): SearchResult = {
    if (q.nResults <= 0) return SearchResult(Nil, Map.empty) // `qq_mem_engine.h:338-340`
    val hits = Searcher.search(ix, q.terms, q.nResults, q.isPhrase).collect().sortBy(_.rank)
    val dfs = docFreqs(q.terms)
    val entries =
      if (!q.returnSnippets) hits.map(h => ResultEntry(h.docId, h.score, ""))
      else {
        import ix.spark.implicits._
        val ids = hits.map(_.docId)
        val bodies = ix.docstore
          .filter(org.apache.spark.sql.functions.col("docId").isin(ids.toSeq: _*))
          .select("docId", "content").as[(Int, String)].collect().toMap
        val qset = q.terms.toSet
        hits.map { h =>
          ResultEntry(h.docId, h.score,
            bodies.get(h.docId).map(Highlighter.snippet(_, qset, q.nSnippetPassages)).getOrElse(""))
        }
      }
    SearchResult(entries.toSeq, dfs)
  }
}
