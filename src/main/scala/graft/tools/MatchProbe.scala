package graft.tools

import graft.corpus.CorpusGen
import graft.index.IndexBuilder
import graft.query.{QueryLog, Searcher}
import org.apache.spark.sql.SparkSession

/** Diagnose a <1.0 bench match_rate: rebuild the bench corpus index at a
  * given size (args(0), default the bench's 2.4M), run the checked-in
  * query log through the batch path, and print [[graft.Bench.matchRateDetail]]'s
  * per-query mismatch lines (first diverging rank, engine vs oracle). */
object MatchProbe {
  def main(args: Array[String]): Unit = {
    val docs = if (args.nonEmpty) args(0).toLong else 2400000L
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shm = java.nio.file.Paths.get("/dev/shm")
    val tmp = (if (java.nio.file.Files.isWritable(shm))
      java.nio.file.Files.createTempDirectory(shm, "graft_mp")
    else java.nio.file.Files.createTempDirectory("graft_mp")).toString
    CorpusGen.generate(spark, docs, seed = 42L, partitions = 32)
      .write.mode("overwrite").parquet(s"$tmp/corpus")
    IndexBuilder.build(spark, spark.read.parquet(s"$tmp/corpus"), s"$tmp/ix", partitions = 32)
    val ix = Searcher.load(spark, s"$tmp/ix")
    val mix = QueryLog.resolve(ix, QueryLog.load("data/queries.log"))
    import spark.implicits._
    val batch = QueryLog.run(ix, mix, 10).as[(Int, Int, Int, Double)].collect()
    val (rate, details) = graft.Bench.matchRateDetail(mix, batch, docs)
    println(s"match_rate=$rate docs=$docs")
    details.foreach(d => println(s"MISMATCH: $d"))
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }
}
