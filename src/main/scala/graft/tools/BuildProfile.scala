package graft.tools

import graft.corpus.CorpusGen
import graft.index.IndexBuilder
import org.apache.spark.sql.SparkSession

/** Dev: `GenCorpus n dir` writes a corpus parquet; `BuildProfile cpus
  * corpusDir ixDir` times build() from it (set SPARK_GRAFT_PROFILE=1 for
  * stage times). */
object GenCorpus {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val dir = args(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    CorpusGen.generate(spark, n, 42L, 32).write.mode("overwrite").parquet(dir)
    spark.stop()
  }
}

object BuildProfile {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val corpusDir = args(1)
    val ixDir = args(2)
    // partitions fixed across parallelism levels, as in Bench.benchParts —
    // the profiled build must be the IDENTICAL job the bench trial times
    val parts = if (args.length > 3) args(3).toInt else 32
    // mirror Bench.session exactly so stage times decompose the bench trial
    val localDir = if (java.nio.file.Files.isWritable(java.nio.file.Paths.get("/dev/shm")))
      java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "graft_prof").toString
    else System.getProperty("java.io.tmpdir")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.local.dir", localDir)
      .config("spark.shuffle.file.buffer", "1m")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "33554432")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    IndexBuilder.build(spark, spark.read.parquet(corpusDir), ixDir, parts)
    println(f"BUILD_TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
