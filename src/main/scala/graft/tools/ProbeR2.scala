package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan/timing probe over the graded queries at bench scale (sf0.1 by
  * default): prints wall seconds per query and asserts the flagship top-k
  * plans TakeOrderedAndProject. Run named queries via args; no args = the
  * historically hot set. Grep output for "WindowExec: No Partition" — any
  * hit is a scale bug. */
object ProbeR2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def timed(name: String): Unit = {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"PROBE $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    val plan = graft.SparkEntry.queries("a5_bm25_topk")(spark, dir)
      .queryExecution.executedPlan.toString
    println("PLAN has TakeOrderedAndProject: " + plan.contains("TakeOrderedAndProject"))
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("a5_bm25_topk", "a5_bm25_topk3", "j4_phrase", "dedup_minhash_pairs",
        "dedup_minhash_sig", "ann_cosine_topk")
    qs.foreach(timed)
    spark.stop()
  }
}
