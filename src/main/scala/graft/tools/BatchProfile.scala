package graft.tools

import graft.corpus.CorpusGen
import graft.index.IndexBuilder
import graft.query.{QueryLog, Searcher}
import org.apache.spark.sql.SparkSession

/** Phase-level profile of the bench's batch query-log path: where does the
  * wall time of `QueryLog.run` go at bench scale? Times (a) the batched
  * term/prefix job, (b) the batched phrase job, (c) each NOT query's
  * single-query pipeline, (d) expansion resolution — separately.
  *
  * Usage: runMain graft.tools.BatchProfile [nDocs]
  */
object BatchProfile {
  private def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 600000L
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-batch-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graft_profile").toString
    try {
      CorpusGen.generate(spark, nDocs, seed = 42L, partitions = 32)
        .write.mode("overwrite").parquet(s"$tmp/corpus")
      timed("index build") {
        IndexBuilder.build(spark, spark.read.parquet(s"$tmp/corpus"), s"$tmp/ix",
          partitions = 32)
      }
      val ix = Searcher.load(spark, s"$tmp/ix")
      val raw = QueryLog.load("data/queries.log")
      println(s"[profile] ${raw.size} queries in log")
      val queryMix = timed("resolve expansions")(QueryLog.resolve(ix, raw))
      // warm JIT once
      timed("full run (warm-up)")(QueryLog.run(ix, queryMix, 10).collect())
      timed("full run (warm)")(QueryLog.run(ix, queryMix, 10).collect())
      // phases
      val termQs = queryMix.filter(q => !q.phrase && q.terms.nonEmpty)
        .map(q => (q.id, q.terms))
      val disjunctive = queryMix.filter(_.disjunctive).map(_.id).toSet
      val excludes = queryMix.filter(q => !q.phrase && q.exclude.nonEmpty)
        .map(q => q.id -> q.exclude).toMap
      val phraseQs = queryMix.filter(q => q.phrase && q.terms.nonEmpty)
        .map(q => (q.id, q.terms))
      val slops = queryMix.filter(q => q.phrase && q.slop > 0).map(q => q.id -> q.slop).toMap
      timed(s"searchAll (${termQs.size} qs)") {
        Searcher.searchAll(ix, termQs, 10, disjunctive, excludes).collect()
      }
      val (totalP, decodedP) = Searcher.lastBatchDiag.get()
      println(s"[profile] batch diag: decoded $decodedP of $totalP postings")
      locally {
        val qm8 = QueryLog.resolve(ix, raw, maxExpansion = 8)
        val t8 = qm8.filter(q => !q.phrase && q.terms.nonEmpty).map(q => (q.id, q.terms))
        val d8 = qm8.filter(_.disjunctive).map(_.id).toSet
        val e8 = qm8.filter(q => !q.phrase && q.exclude.nonEmpty).map(q => q.id -> q.exclude).toMap
        timed(s"searchAll maxExp=8 (${t8.size} qs)") {
          Searcher.searchAll(ix, t8, 10, d8, e8).collect()
        }
      }
      val narrowQs = termQs.filter(q => !disjunctive(q._1) && !excludes.contains(q._1))
      val wideQs = termQs.filter(q => disjunctive(q._1))
      timed(s"searchAll narrow only (${narrowQs.size} qs)") {
        Searcher.searchAll(ix, narrowQs, 10, Set.empty).collect()
      }
      timed(s"searchAll wide only (${wideQs.size} qs)") {
        Searcher.searchAll(ix, wideQs, 10, disjunctive).collect()
      }
      timed(s"searchAllPhrase (${phraseQs.size} qs)") {
        Searcher.searchAllPhrase(ix, phraseQs, 10, slops).collect()
      }
      // expansion queries individually (they ride inside searchAll)
      queryMix.filter(_.disjunctive).foreach { q =>
        timed(s"disj q${q.id} (${q.terms.size} terms)") {
          Searcher.searchAll(ix, Seq((q.id, q.terms)), 10, Set(q.id)).collect()
        }
      }
    } finally {
      spark.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }
}
