package graft

import graft.core.{Bm25, LenByte}
import graft.functions.{GraftExtensions, GraftFunctions}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class ExpressionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("graft_len_byte matches LenByte.encode under codegen") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val vals = (0L to 300L) ++ Seq(0x80L, 0xffffffffL, 123456L)
    val got = vals.toDF("len")
      .selectExpr("len", "graft_len_byte(len) AS lb")
      .as[(Long, Int)].collect().toMap
    vals.foreach(v => assert(got(v) == LenByte.encode(v), s"len=$v"))
    // Column wrapper path
    val viaCol = vals.toDF("len")
      .select($"len", graft.functions.functions.len_byte($"len").as("lb"))
      .as[(Long, Int)].collect().toMap
    assert(viaCol == got)
  }

  test("graft_len_lossy matches LenByte.lossy under codegen (incl. C++ goldens)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val vals = (0L to 300L) ++ Seq(0x80L, 0xffffffffL, 123456L, 0xf0000000L)
    val got = vals.toDF("len")
      .select($"len", graft.functions.functions.len_lossy($"len").as("lossy"))
      .as[(Long, Long)].collect().toMap
    vals.foreach(v => assert(got(v) == LenByte.lossy(v), s"len=$v"))
    // goldens derived from tests_8.cc:25-49: decode(encode(0x80)) = 0x80,
    // decode(encode(0xffffffff)) = 0xf0000000
    assert(got(0x80L) == 0x80L && got(0xffffffffL) == 0xf0000000L)
  }

  test("graft_bm25_idf matches Bm25.idf") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val cases = Seq((1L, 1L), (3L, 1L), (1000L, 999L), (1000000L, 1L))
    val got = cases.toDF("n", "df")
      .selectExpr("n", "df", "graft_bm25_idf(n, df) AS idf")
      .as[(Long, Long, Double)].collect()
    got.foreach { case (n, df, idf) =>
      assert(math.abs(idf - Bm25.idf(n, df)) < 1e-15, s"n=$n df=$df")
    }
  }

  test("type check rejects wrong input types") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_len_byte('abc')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("bigint") ||
      e.getMessage.toLowerCase.contains("type"))
  }
}
