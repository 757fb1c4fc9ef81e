package graft.tools
import org.apache.spark.sql.SparkSession

/** Per-query latency breakdown of the resident serving path, driving the
  * SAME dispatch as `Bench` (search / prefix / fuzzy / wildcard / bool) over
  * the checked-in query log — finds which query classes own the serving
  * tail. Args: [nDocs] (default 600000). */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 600000L
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "serve").toString
    val corpus = graft.corpus.CorpusGen.generate(spark, nDocs, 42L, 32)
    graft.index.IndexBuilder.build(spark, corpus, tmp, 8)
    val ix = graft.query.Searcher.load(spark, tmp)
    val qs = graft.query.QueryLog.resolve(ix,
      graft.query.QueryLog.load("data/queries.log"))
    val svc = new graft.query.LocalService(ix)
    def serve(q: graft.query.QueryLog.LogQuery): Seq[graft.core.Oracle.Hit] =
      (q.prefix, q.fuzzy, q.wildcard, q.bool) match {
        case (Some(p), _, _, _)      => svc.searchPrefix(p, 10)
        case (_, Some((t, d)), _, _) => svc.searchFuzzy(t, 10, d)
        case (_, _, Some(w), _)      => svc.searchWildcard(w, 10)
        case (_, _, _, Some(b))      => svc.searchBool(b, 10)
        case _ => svc.search(q.terms, 10, q.phrase, q.exclude, q.slop)
      }
    def kind(q: graft.query.QueryLog.LogQuery): String =
      if (q.prefix.nonEmpty) "prefix" else if (q.fuzzy.nonEmpty) "fuzzy"
      else if (q.wildcard.nonEmpty) "wildcard" else if (q.bool.nonEmpty) "bool"
      else if (q.phrase && q.slop > 0) "prox" else if (q.phrase) "phrase"
      else if (q.exclude.nonEmpty) "not" else "term"
    qs.foreach(serve) // warm
    // two measured passes: pass 1 still pays C2 JIT on the first queries,
    // pass 2 is steady state — compare them to tell compilation tails from
    // real serving cost
    (1 to 2).foreach { pass =>
      qs.foreach { q =>
        val t = System.nanoTime()
        var r = 0
        while (r < 5) { serve(q); r += 1 }
        println(f"PERQ$pass ${(System.nanoTime() - t) / 5e6}%8.2f ms  ${kind(q)}%-8s " +
          (q.prefix.orElse(q.wildcard).orElse(q.fuzzy.map(_._1))
            .getOrElse(q.terms.take(6).mkString(" "))))
      }
    }
    val t0 = System.nanoTime()
    var r = 0
    while (r < 20) { qs.foreach(serve); r += 1 }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"SERVED qps=${qs.size * 20 / sec}%.1f  avg_ms=${sec / (qs.size * 20) * 1000}%.2f  n=${qs.size}")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }
}
