package graft.tools

import graft.index.IndexBuilder
import org.apache.spark.sql.SparkSession

/** Dev: single-JVM stage-time decomposition of the bench's scaling trials.
  *
  * Mirrors `Bench.main`'s trial conditions exactly — page warm-up first
  * (lazily-backed-VM guard), one untimed JIT warm-up build, then profiled
  * builds (`SPARK_GRAFT_PROFILE=1` stage lines) at the requested core
  * counts, all in ONE JVM so once-touched pages stay resident as they do
  * across bench trials.
  *
  * Usage: `ProfileBuilds corpusDir cores...` (e.g. `ProfileBuilds
  * /dev/shm/c 8 8 2`).
  */
object ProfileBuilds {
  private def session(cpus: Int, parts: Int, localDir: String): SparkSession =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-profile-$cpus")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.local.dir", localDir)
      .config("spark.shuffle.file.buffer", "1m")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "33554432")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()

  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val cores = args.drop(1).map(_.toInt)
    val parts = sys.env.getOrElse("SPARK_GRAFT_BENCH_PARTS", "32").toInt
    val localDir = {
      val shm = java.nio.file.Paths.get("/dev/shm")
      if (java.nio.file.Files.isWritable(shm)) {
        val d = shm.resolve("graft-prof-shuffle")
        java.nio.file.Files.createDirectories(d)
        d.toString
      } else System.getProperty("java.io.tmpdir")
    }
    val warmGb = sys.env.getOrElse("SPARK_GRAFT_PAGE_WARM_GB", "28").toLong
    val (gb, warmSec) = graft.Bench.pageWarm(warmGb, 1500)
    println(f"PAGE_WARM $gb%.1f GB in $warmSec%.1f s")
    def build(cpus: Int, ix: String): Double = {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ix))
      val spark = session(cpus, parts, localDir)
      try {
        spark.sparkContext.setLogLevel("WARN")
        val t0 = System.nanoTime()
        IndexBuilder.build(spark, spark.read.parquet(corpusDir), ix, parts)
        (System.nanoTime() - t0) / 1e9
      } finally spark.stop()
    }
    // untimed JIT warm-up on the first requested core count
    val warm = build(cores.head, s"/dev/shm/graft_prof_warm")
    println(f"WARMUP_BUILD cores=${cores.head} $warm%.2f s")
    cores.zipWithIndex.foreach { case (c, i) =>
      val sec = build(c, s"/dev/shm/graft_prof_ix$i")
      println(f"PROFILED_BUILD cores=$c $sec%.2f s")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("/dev/shm/graft_prof_warm"))
    cores.indices.foreach(i =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"/dev/shm/graft_prof_ix$i")))
  }
}
