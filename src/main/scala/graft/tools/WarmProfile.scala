package graft.tools

import graft.index.IndexBuilder
import org.apache.spark.sql.SparkSession

/** Dev: warm-JVM scaling measurement — run build() twice per parallelism
  * level in ONE JVM (second run is JIT/codegen-warm), print both. */
object WarmProfile {
  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val aqe = if (args.length > 1) args(1) else "true"
    def run(cpus: Int, tag: String): Unit = {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.io.compression.codec",
          sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_CODEC", "lz4"))
        .config("spark.shuffle.file.buffer", "1m")
        .config("spark.local.dir",
          sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      (1 to 2).foreach { i =>
        val dir = java.nio.file.Files.createTempDirectory(s"warm$tag").toString
        try new ProcessBuilder("sync").start().waitFor() catch { case _: Throwable => }
        Thread.sleep(1500)
        val t0 = System.nanoTime()
        IndexBuilder.build(spark, spark.read.parquet(corpusDir), dir, cpus)
        println(f"WARM cpus=$cpus run=$i aqe=$aqe total=${(System.nanoTime() - t0) / 1e9}%.2f")
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      }
      spark.stop()
    }
    val lv = sys.env.getOrElse("SPARK_GRAFT_WARM_LEVELS", "2,8").split(",").map(_.toInt)
    lv.zipWithIndex.foreach { case (c, i) => run(c, ('a' + i).toChar.toString) }
  }
}
