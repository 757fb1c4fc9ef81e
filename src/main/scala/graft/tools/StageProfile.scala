package graft.tools

import graft.corpus.CorpusGen
import graft.index.IndexBuilder
import org.apache.spark.sql.SparkSession

/** Dev profiling: per-stage wall times of the index build. */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 32
    val n = if (args.length > 1) args(1).toLong else 60000L
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("prof").toString

    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val corpus = CorpusGen.generate(spark, n, 42L, cpus)
    t("gen+count") { corpus.count() }
    val docs = t("assignDocIds") {
      val d = IndexBuilder.assignDocIds(spark, corpus, cpus); d.count(); d
    }
    t("docstore") { docs.write.mode("overwrite").parquet(s"$dir/docstore") }
    val store = spark.read.parquet(s"$dir/docstore").as[IndexBuilder.DocRow]
    t("tokenized") { IndexBuilder.flatPostings(store).write.mode("overwrite").parquet(s"$dir/tokenized") }
    val flat = spark.read.parquet(s"$dir/tokenized").as[IndexBuilder.FlatPosting]
    t("doclen") {
      import org.apache.spark.sql.functions._
      flat.groupBy("docId").agg(sum($"tf").cast("int").as("len"))
        .write.mode("overwrite").parquet(s"$dir/doclen")
    }
    t("termstats") {
      import org.apache.spark.sql.functions._
      flat.groupBy("term").agg(count(lit(1)).as("df"), sum($"tf").cast("long").as("cf"))
        .write.mode("overwrite").parquet(s"$dir/termstats")
    }
    t("blocks") {
      val totalPostings = flat.count()
      val bp = math.min(4096L, math.max(cpus.toLong,
        totalPostings / IndexBuilder.PostingsPerPartition)).toInt
      println(s"  blocks partitions = $bp")
      IndexBuilder.buildBlocks(spark, flat, n, bp)
        .write.mode("overwrite").parquet(s"$dir/postings")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
