package graft.tools

import graft.corpus.CorpusGen
import graft.index.IndexBuilder
import org.apache.spark.sql.SparkSession

/** Dev probe: does the PARTITION COUNT (vs the core count) explain the
  * N-level build times? Runs the same corpus through build() at
  * (cores, partitions) combinations, interleaved, in one JIT-warmed JVM —
  * the bench currently ties partitions to cores, but on a real cluster the
  * job's partitioning does not change with executor count, so if
  * partitions=cores penalizes the N level the bench should fix partitions
  * across levels. Usage: `ScalingProbe [docs] [reps]`. */
object ScalingProbe {
  private def session(cpus: Int, parts: Int): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .appName(s"graft-probe-$cpus-$parts")
    .config("spark.sql.shuffle.partitions", parts.toString)
    .config("spark.local.dir", {
      val shm = java.nio.file.Paths.get("/dev/shm")
      if (java.nio.file.Files.isWritable(shm)) {
        val d = shm.resolve("graft-shuffle"); java.nio.file.Files.createDirectories(d); d.toString
      } else System.getProperty("java.io.tmpdir")
    })
    .config("spark.shuffle.file.buffer", "1m")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.files.maxPartitionBytes", "33554432")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def main(args: Array[String]): Unit = {
    val docs = args.headOption.map(_.toLong).getOrElse(1200000L)
    val reps = if (args.length > 1) args(1).toInt else 2
    val combosArg: Seq[(Int, Int)] =
      if (args.length > 2) args(2).split(",").toSeq.map { s =>
        val Array(c, p) = s.split(":"); (c.toInt, p.toInt)
      } else Seq((2, 2), (2, 32), (8, 8), (8, 32))
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "graft_probe").toString
    locally {
      val spark = session(8, 8)
      spark.sparkContext.setLogLevel("WARN")
      CorpusGen.generate(spark, docs, 42L, 32).write.mode("overwrite").parquet(s"$root/corpus")
      CorpusGen.generate(spark, 200000L, 43L, 32).write.mode("overwrite").parquet(s"$root/warm")
      spark.stop()
    }
    def run(cpus: Int, parts: Int, corpus: String): Double = {
      val dir = s"$root/ix"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      try new ProcessBuilder("sync").start().waitFor() catch { case _: Throwable => () }
      Thread.sleep(1000)
      val spark = session(cpus, parts)
      try {
        spark.sparkContext.setLogLevel("WARN")
        val t0 = System.nanoTime()
        IndexBuilder.build(spark, spark.read.parquet(corpus), dir, partitions = parts)
        (System.nanoTime() - t0) / 1e9
      } finally spark.stop()
    }
    run(8, 32, s"$root/warm") // JIT warmup
    run(2, 32, s"$root/warm")
    val combos = combosArg
    val acc = scala.collection.mutable.Map.empty[(Int, Int), List[Double]].withDefaultValue(Nil)
    (0 until reps).foreach { r =>
      val order = if (r % 2 == 0) combos else combos.reverse
      order.foreach { case (c, p) =>
        val t = run(c, p, s"$root/corpus")
        acc((c, p)) = t :: acc((c, p))
        println(f"PROBE cores=$c%2d parts=$p%2d rep=$r t=$t%8.2f s")
      }
    }
    combos.foreach { case (c, p) =>
      println(f"PROBE_MIN cores=$c%2d parts=$p%2d min=${acc((c, p)).min}%8.2f s over ${acc((c, p)).size} reps")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }
}
