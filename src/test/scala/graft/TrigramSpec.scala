package graft

import graft.index.TrigramIndex
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class TrigramSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, "def foo_bar(x): return x + 1"),
      (1L, "val fooBar = foo_bar(2)"),
      (2L, "completely unrelated text body"),
      (3L, "x = 9; foo_bar appears again here"),
      (4L, "ab"), // shorter than a trigram
      (5L, "one foo two here three foo") // candidate for "here foo", verify rejects
    ).toDF("doc_id", "text")
  }

  private lazy val blocks = TrigramIndex.buildBlocks(docs, "doc_id", "text").cache()
  private lazy val stats = {
    import spark.implicits._
    TrigramIndex.triStats(blocks).as[(String, Long)].collect().toMap
  }

  test("trigramsOf: distinct, ordered, raw chars") {
    assert(TrigramIndex.trigramsOf("abcabc").toSeq == Seq("abc", "bca", "cab"))
    assert(TrigramIndex.trigramsOf("ab").isEmpty)
    assert(TrigramIndex.trigramsOf("a b").toSeq == Seq("a b"))
  }

  test("runs roundtrip and doc_ids ascend per trigram") {
    import spark.implicits._
    val rows = blocks.as[(String, Int, Int, Array[Byte])].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val ids = rs.sortBy(_._2).flatMap(r => TrigramIndex.decodeRun(r._2, r._3, r._4))
      assert(ids.sameElements(ids.sorted.distinct))
    }
    // a trigram present in docs 0,1,3
    val fo = rows.filter(_._1 == "foo").flatMap(r => TrigramIndex.decodeRun(r._2, r._3, r._4))
    assert(fo.sorted.sameElements(Array(0, 1, 3, 5)))
  }

  test("substring search is exact, incl. token-straddling needles") {
    import spark.implicits._
    def search(n: String): Seq[Long] =
      TrigramIndex.substringSearch(docs, blocks, stats, n)
        .as[Long].collect().sorted.toSeq
    assert(search("foo_bar(") == Seq(0L, 1L))        // straddles tokens
    assert(search("return x") == Seq(0L))
    assert(search("absent needle") == Seq())
    assert(search("ab") == Seq(4L))                  // <3 chars: verify-scan path
    // every trigram of the needle is present in doc 5, but the needle
    // itself is not — the candidate survives pruning, verify rejects it
    val cand = TrigramIndex.candidates(blocks, TrigramIndex.trigramsOf("here foo").toSeq)
      .as[Long].collect().toSeq
    assert(cand.contains(5L))
    // duplicated trigrams in the request must not inflate the match bar
    val dup = TrigramIndex.candidates(blocks, Seq("foo", "foo"))
      .as[Long].collect().sorted.toSeq
    assert(dup == Seq(0L, 1L, 3L, 5L))
    assert(search("here foo") == Seq())
  }

  test("planner picks rarest trigrams deterministically") {
    val (chosen, absent) = TrigramIndex.planTrigrams(stats, "foo_bar", 3)
    assert(chosen.size == 3 && !absent)
    assert(chosen == chosen.sortBy(t => (stats(t), t)))
    val (_, miss) = TrigramIndex.planTrigrams(stats, "zzzqqq", 2)
    assert(miss)
  }

  test("regex literal trigrams are conservative") {
    assert(TrigramIndex.regexLiteralTrigrams("foo_bar\\(").toSet == Set("foo", "oo_", "o_b", "_ba", "bar"))
    assert(TrigramIndex.regexLiteralTrigrams("slow [a-z]*table").toSet ==
      Set("slo", "low", "ow ", "tab", "abl", "ble"))
    assert(TrigramIndex.regexLiteralTrigrams("abc|def").isEmpty)
    assert(TrigramIndex.regexLiteralTrigrams("abcd?e").toSet == Set("abc")) // d optional
    assert(TrigramIndex.regexLiteralTrigrams("ab+cd").toSet == Set()) // frags "ab","cd" too short
  }

  test("quantified groups and (?…) prefixes are not required") {
    // '(abcd)*' matches with zero repetitions: its contents must not be required
    assert(TrigramIndex.regexLiteralTrigrams("xxxx(abcd)*yyyy").toSet ==
      Set("xxx", "yyy"))
    assert(TrigramIndex.regexLiteralTrigrams("xxxx(abcd)?yyyy").toSet ==
      Set("xxx", "yyy"))
    assert(TrigramIndex.regexLiteralTrigrams("xxxx(abcd){0,3}yyyy").toSet ==
      Set("xxx", "yyy"))
    // '(abcd)+' requires at least one occurrence: contents stay required
    assert(TrigramIndex.regexLiteralTrigrams("(abcd)+efgh").toSet ==
      Set("abc", "bcd", "efg", "fgh"))
    // non-capturing group prefix must not leak ':' into fragments
    assert(TrigramIndex.regexLiteralTrigrams("(?:abcd)efgh").toSet ==
      Set("abc", "bcd", "efg", "fgh"))
    // negative lookahead content is NOT required in a match
    assert(TrigramIndex.regexLiteralTrigrams("(?!abcd)wxyz0").toSet ==
      Set("wxy", "xyz", "yz0"))
    assert(TrigramIndex.regexLiteralTrigrams("(?=abcd)wxyz0").toSet ==
      Set("wxy", "xyz", "yz0"))
    // nested: outer optional discards inner required content too
    assert(TrigramIndex.regexLiteralTrigrams("((abcd)+wxyz)?mnop").toSet ==
      Set("mno", "nop"))
  }

  test("regex search matches rlike exactly") {
    import spark.implicits._
    def rx(p: String): Seq[Long] =
      TrigramIndex.regexSearch(docs, blocks, stats, p).as[Long].collect().sorted.toSeq
    assert(rx("foo_bar\\(.\\)") == Seq(0L, 1L))
    assert(rx("unrel[a-z]+ text") == Seq(2L))
    assert(rx("zzz[0-9]+") == Seq())
    // no usable fragment: full-scan verify fallback still exact
    assert(rx("f.o") == Seq(0L, 1L, 3L, 5L))
  }
}
