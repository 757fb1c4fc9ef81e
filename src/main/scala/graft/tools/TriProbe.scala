package graft.tools

import graft.index.TrigramIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing decomposition of the trigram index path (p9/p10):
  * build, candidates, verify-join — to find where wall time goes. */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"TRI $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    t("warmup range")(spark.range(1000).count())
    t("range again")(spark.range(1000).count())
    t("range shuffle")(spark.range(100000).groupBy((col("id") % 7).as("k")).count().count())
    t("docs count")(docs.count())
    t("docs count again")(docs.count())
    val blocks = t("build+cache") {
      val b = TrigramIndex.buildBlocks(docs, "doc_id", "text").cache()
      b.count(); b
    }
    t("blocks count warm")(blocks.count())
    val tris = TrigramIndex.trigramsOf("scan slo").toSeq
    val cand = t("candidates")(
      TrigramIndex.candidates(blocks, tris).cache())
    t("candidates count")(cand.count())
    t("candidates count warm")(cand.count())
    t("verify join") {
      docs.join(cand.withColumnRenamed("doc_id", "cand_id"),
        col("doc_id").cast("int") === col("cand_id"))
        .filter(col("text").contains("scan slo")).count()
    }
    t("second candidates path") {
      TrigramIndex.candidates(blocks, TrigramIndex.trigramsOf("slow fas").toSeq).count()
    }
    spark.stop()
  }
}
