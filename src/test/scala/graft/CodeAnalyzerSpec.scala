package graft

import graft.core.Tokenizer
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The code analyzer end-to-end: subtokens injected at index time
  * (same-position posting, Lucene WordDelimiterGraphFilter shape) make
  * `bar` find `fooBar`/`foo_bar` through the REAL index, while doc length,
  * positions, and phrase semantics stay those of the original stream. */
class CodeAnalyzerSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val tmp = java.nio.file.Files.createTempDirectory("graft_code_ix").toString

  override def afterAll(): Unit = {
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  private lazy val corpus = {
    val s = spark
    import s.implicits._
    Seq(
      ("r0", "a.py", "c0", "py", "def fooBar(x): return x"),
      ("r0", "b.py", "c0", "py", "val foo_bar = parseHTTPResponse()"),
      ("r0", "c.py", "c0", "py", "nothing relevant here"),
      ("r0", "d.py", "c0", "py", "plain foobar literal"),
      ("r0", "e.py", "c0", "py",
        "alpha beta\ngamma delta grep_target\nepsilon\nmore grep_target here")
    ).toDF("repo", "path", "commit", "lang", "content")
  }

  private lazy val eng = Engine.build(spark, corpus, tmp, partitions = 4,
    codeAnalyzer = true, withTrigrams = true)

  test("groupedCode injects subtokens at the original position") {
    val g = Tokenizer.groupedCode("def fooBar(x)").map(t => t._1 -> t._2.toSeq).toMap
    assert(g("foobar") == Seq(1))
    assert(g("foo") == Seq(1)) // same position as the original token
    assert(g("bar") == Seq(1))
    assert(g("def") == Seq(0))
    assert(g("x") == Seq(2))
    // doc length stays the original token count (3), not 3 + injected
    val lens = Tokenizer.groupedCode("def fooBar(x)")
      .flatMap(_._2).max + 1
    assert(lens == 3)
  }

  test("subtoken query hits camel and snake docs through the real index") {
    def ids(q: String) =
      eng.search(Engine.SearchQuery(Seq(q), nResults = 10)).entries.map(_.docId).sorted
    // docIds follow (repo, path) sort: a.py=0, b.py=1, c.py=2, d.py=3
    assert(ids("bar") == Seq(0, 1))      // fooBar + foo_bar (note: foo_bar
                                         // tokenizes whole; subtokens split it)
    assert(ids("foo") == Seq(0, 1))
    assert(ids("http") == Seq(1))        // parseHTTPResponse
    assert(ids("response") == Seq(1))
    assert(ids("foobar") == Seq(0, 3))   // original lowercased token + plain
    assert(ids("zzz") == Seq())
  }

  test("doc lengths and phrase positions unaffected by injection") {
    import spark.implicits._
    val lens = eng.ix.doclen.select("docId", "len").as[(Int, Int)].collect().toMap
    assert(lens(0) == 5) // def fooBar x return x
    assert(lens(3) == 3) // plain foobar literal
    // phrase over ORIGINAL adjacent tokens still matches doc 0 only
    val ph = eng.search(Engine.SearchQuery(Seq("def", "foobar"), nResults = 10,
      isPhrase = true)).entries.map(_.docId)
    assert(ph == Seq(0))
    val ph2 = eng.search(Engine.SearchQuery(Seq("foobar", "x"), nResults = 10,
      isPhrase = true)).entries.map(_.docId)
    assert(ph2 == Seq(0))
    // a phrase whose FIRST term is an injected subtoken: same-position
    // injection keeps adjacency ("bar" sits at fooBar's position, "x"
    // follows) — and the code-mode bloom store must not falsely prune it
    val ph3 = eng.search(Engine.SearchQuery(Seq("bar", "x"), nResults = 10,
      isPhrase = true)).entries.map(_.docId)
    assert(ph3 == Seq(0))
    // subtoken phrase across an identifier: "foo bar" matches both split
    // identifiers (positions are equal — adjacency is position+1, so an
    // intra-identifier pair does NOT match; only cross-token pairs do)
    val ph4 = eng.search(Engine.SearchQuery(Seq("parse", "http"), nResults = 10,
      isPhrase = true)).entries.map(_.docId)
    assert(ph4 == Seq()) // same position, not adjacent — documented semantics
  }

  test("substring and regex search through the persisted trigram stage") {
    // raw substring straddling token boundaries, ranked by occurrence count
    assert(eng.searchSubstring("fooBar(x)", 10) == Seq((0, 1L)))
    assert(eng.searchSubstring("oo_b", 10) == Seq((1, 1L)))
    assert(eng.searchSubstring("o", 10).head._2 >= 2L) // occ counting works
    assert(eng.searchSubstring("not in any doc", 10) == Seq())
    // regex with literal-fragment pruning + rlike verification
    assert(eng.searchRegex("foo_?[Bb]ar", 10) == Seq(0, 1, 3))
    assert(eng.searchRegex("parseHTTP[A-Za-z]+\\(\\)", 10) == Seq(1))
    // the trigram stage is committed and reloadable
    val eng2 = Engine.load(spark, tmp)
    assert(eng2.searchSubstring("fooBar(x)", 10) == Seq((0, 1L)))
  }

  test("trigram dfs are point-probed, never the full dictionary") {
    val eng2 = Engine.load(spark, tmp)
    val needle = "fooBar(x)"
    val nTris = graft.index.TrigramIndex.trigramsOf(needle).length
    assert(eng2.searchSubstring(needle, 10) == Seq((0, 1L)))
    // cold probe fetches at most the needle's own trigram dfs
    assert(eng2.lastTriProbeCount > 0 && eng2.lastTriProbeCount <= nTris)
    // warm cache: the repeat query probes nothing
    assert(eng2.searchSubstring(needle, 10) == Seq((0, 1L)))
    assert(eng2.lastTriProbeCount == 0)
    // absent trigrams are negative-cached too
    assert(eng2.searchSubstring("zzzqqqzzz", 10) == Seq())
    assert(eng2.searchSubstring("zzzqqqzzz", 10) == Seq())
    assert(eng2.lastTriProbeCount == 0)
  }

  test("fsck covers the trigram stage: clean index passes both invariants") {
    eng // force build
    val res = graft.index.Integrity.check(spark, tmp).collect()
    val names = res.map(_.getAs[String]("check")).toSet
    assert(names.contains("trigram_decode") && names.contains("trigram_doc_coverage"))
    res.foreach(r => assert(r.getAs[Boolean]("ok"),
      s"fsck: ${r.getAs[String]("check")} -> ${r.getAs[Long]("violations")}"))
  }

  test("grep returns (doc, line number, line) hits on candidate docs only") {
    assert(eng.grep("grep_target", 10) == Seq(
      (4, 1L, "gamma delta grep_target"),
      (4, 3L, "more grep_target here")))
    assert(eng.grep("not anywhere", 10) == Seq())
    // maxLines caps output deterministically
    assert(eng.grep("grep_target", 1) == Seq((4, 1L, "gamma delta grep_target")))
  }
}
