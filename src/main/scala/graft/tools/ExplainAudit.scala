package graft.tools

import graft.corpus.CorpusGen
import graft.index.IndexBuilder
import graft.query.Searcher
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev: print formatted plans of the hot paths and assert the properties we
  * care about at scale: filter pushdown to the parquet scan, column pruning
  * (positions unread on the scoring path), broadcast of query terms. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("audit").toString
    IndexBuilder.build(spark, CorpusGen.generate(spark, 2000, 42L, 8), dir, 8)
    val ix = Searcher.load(spark, dir)

    println("==== P1 term lookup scan ====")
    ix.postings.filter($"term".isin("if", "return"))
      .select("term", "prevDocId", "n", "docIds", "tfs")
      .explain("formatted")

    println("==== batch searchAll plan ====")
    Searcher.searchAll(ix, Seq((0, Seq("if", "return")), (1, Seq("val"))), 10)
      .explain("formatted")

    println("==== single query plan (decode+join+agg+topk) ====")
    // the search() API collects; rebuild its internal frame for explain
    val posting = ix.postings.filter($"term".isin("if", "return"))
      .select("term", "prevDocId", "n", "docIds", "tfs")
      .as[(String, Int, Int, Array[Byte], Array[Byte])]
      .flatMap { case (t, prev, n, ids, tfs) =>
        graft.index.PostingCodec.decodeDocIdTf(prev, n, ids, tfs).iterator.map(p => (t, p._1, p._2))
      }.toDF("term", "docId", "tf")
    posting.join(ix.doclen.select("docId", "lenByte"), "docId")
      .groupBy($"docId").agg(count(lit(1)).as("nMatched"), sum($"tf").as("s"))
      .orderBy(desc("s"), asc("docId")).limit(10)
      .explain("formatted")

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
