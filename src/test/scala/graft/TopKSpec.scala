package graft

import graft.query.TopKAggregator
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "7")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("typed Aggregator top-k equals orderBy+limit, incl. ties (A5)") {
    import spark.implicits._
    val r = new scala.util.Random(11)
    // scores drawn from a small set to force plenty of ties
    val rows = (0 until 5000).map(i => (i, (r.nextInt(40) / 7.0)))
    val ds = rows.toDS().repartition(13)
    val k = 25
    val viaAgg = ds.select(new TopKAggregator(k).toColumn).head()
    val viaSort = ds.orderBy(desc("_2"), asc("_1")).limit(k)
      .as[(Int, Double)].collect()
    assert(viaAgg.toSeq == viaSort.toSeq)
  }

  test("per-group top-k via groupBy + Aggregator (no window sort)") {
    import spark.implicits._
    val r = new scala.util.Random(7)
    val rows = (0 until 3000).map(i => (i % 5, (i, r.nextDouble())))
    val ds = rows.toDS().repartition(9)
    val got = ds.groupByKey(_._1)
      .mapValues(_._2)
      .agg(new TopKAggregator(3).toColumn)
      .collect().toMap
    val want = rows.groupBy(_._1).view.mapValues(
      _.map(_._2).sortBy(x => (-x._2, x._1)).take(3)).toMap
    (0 until 5).foreach { g => assert(got(g).toSeq == want(g).toSeq, s"group $g") }
  }
}
