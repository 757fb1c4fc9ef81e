package graft.tools
import org.apache.spark.sql.SparkSession
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get("/dev/shm"), "serve").toString
    val corpus = graft.corpus.CorpusGen.generate(spark, 600000, 42L, 32)
    graft.index.IndexBuilder.build(spark, corpus, tmp, 8)
    val ix = graft.query.Searcher.load(spark, tmp)
    val qs = graft.query.QueryLog.load("data/queries.log")
    val svc = new graft.query.LocalService(ix)
    qs.foreach(q => svc.search(q.terms, 10, q.phrase)) // warm
    qs.foreach { q =>
      val t = System.nanoTime()
      var r = 0
      while (r < 5) { svc.search(q.terms, 10, q.phrase); r += 1 }
      println(f"PERQ ${(System.nanoTime() - t) / 5e6}%8.2f ms  phrase=${q.phrase} ${q.terms.mkString(" ")}")
    }
    val t0 = System.nanoTime()
    var r = 0
    while (r < 20) { qs.foreach(q => svc.search(q.terms, 10, q.phrase)); r += 1 }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"SERVED qps=${qs.size * 20 / sec}%.1f  avg_ms=${sec / (qs.size * 20) * 1000}%.2f")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }
}
