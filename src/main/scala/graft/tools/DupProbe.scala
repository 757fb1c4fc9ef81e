package graft.tools

import graft.ops.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for the duplicated-span pipeline (dedup_dup_spans). */
object DupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"DUP $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    t("warmup")(docs.count())
    val staged = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).cast("long").as("len"))
    val grams = staged.select(col("doc_id"), col("len"),
      posexplode(TextOps.shingles(col("t"), 5)).as(Seq("pos", "g")))
    t("grams count")(grams.count())
    val dup = grams.select("g", "doc_id").distinct()
      .groupBy("g").agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs") >= 2).select("g")
    t("dup count")(dup.count())
    val dpos = grams.join(broadcast(dup), "g")
    t("dpos count")(dpos.count())
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")
    val cover = dpos.withColumn("nxt", lead(col("pos"), 1).over(w))
      .groupBy("doc_id")
      .agg(sum(least(lit(5), coalesce(col("nxt") - col("pos"), lit(5))))
        .cast("long").as("dup_tokens"), max("len").as("len"))
    t("cover count")(cover.count())
    val dgrams = dpos.select("doc_id", "g").distinct()
      .groupBy("doc_id").agg(count(lit(1)).cast("long").as("dup_ngrams"))
    t("dgrams count")(dgrams.count())
    t("full")(graft.ops.Dedup.dupSpans(docs, "text", "doc_id", 5).count())
    spark.stop()
  }
}
