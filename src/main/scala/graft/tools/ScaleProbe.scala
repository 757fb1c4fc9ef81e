package graft.tools
import graft.corpus.CorpusGen
import graft.index.IndexBuilder
import org.apache.spark.sql.SparkSession
/** Per-stage scaling probe: builds the bench corpus once, then times the
  * index build per stage (SPARK_GRAFT_PROFILE=1) at the given core counts. */
object ScaleProbe {
  private def session(cpus: Int): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .appName(s"scale-$cpus")
    .config("spark.sql.shuffle.partitions", cpus.toString)
    .config("spark.local.dir", "/dev/shm/graft-shuffle")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.files.maxPartitionBytes", "33554432")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  def main(args: Array[String]): Unit = {
    val docs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "600000").toLong
    val cores = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(2, 8)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("/dev/shm/graft-shuffle"))
    val tmp = java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get("/dev/shm"), "graft_scale").toString
    locally {
      val s = session(8); s.sparkContext.setLogLevel("WARN")
      CorpusGen.generate(s, docs, 42L, 32).write.mode("overwrite").parquet(s"$tmp/corpus")
      s.stop()
    }
    cores.foreach { c =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$tmp/ix"))
      try { new ProcessBuilder("sync").start().waitFor() } catch { case _: Throwable => }
      Thread.sleep(1500)
      val s = session(c); s.sparkContext.setLogLevel("WARN")
      val t0 = System.nanoTime()
      IndexBuilder.build(s, s.read.parquet(s"$tmp/corpus"), s"$tmp/ix", partitions = c)
      println(f"SCALE cores=$c total=${(System.nanoTime()-t0)/1e9}%.2f s")
      s.stop()
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }
}
