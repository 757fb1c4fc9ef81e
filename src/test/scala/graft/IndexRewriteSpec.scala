package graft

import graft.plans.{GraftMatch, IndexCatalog, IndexRewrite}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The index-aware optimizer rewrite (graft.plans.IndexSemiJoinRule): a
  * `graft_match` filter over the corpus becomes a broadcast LEFT SEMI join
  * against the posting list when (and only when) an IndexCatalog entry
  * covers it; semantics are identical either way. */
class IndexRewriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // parquet-backed (a LocalRelation fixture would be pre-evaluated by
  // ConvertToLocalRelation before the user-provided batch ever runs — the
  // rewrite exists for real scans)
  private lazy val fixturePath: String = {
    val s = spark
    import s.implicits._
    val p = java.nio.file.Files.createTempDirectory("graft_ixr").toString + "/docs"
    Seq(
      (0L, "the quick fox jumps"),
      (1L, "a window over the table"),
      (2L, "window Window WINDOW"),
      (3L, "no match here"),
      (4L, "window again, fox too")
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(p)
    p
  }
  private def fixture = spark.read.parquet(fixturePath)

  /** Registers an index whose lookup is computed from the same fixture by
    * tokenizing — i.e. exactly what a posting list built with the engine
    * tokenizer contains for the term. */
  private def registerFixtureIndex(key: String): Unit =
    IndexCatalog.register(key, "doc_id", term =>
      fixture.filter(array_contains(ops.TextOps.tokens(col("text")), term))
        .select("doc_id"))

  test("rewrite fires: LeftSemi join, no graft_match residue, identical rows") {
    IndexRewrite.install(spark)
    val key = "spec:basic"
    registerFixtureIndex(key)
    val q = fixture.filter(IndexRewrite.graftMatch(key, col("text"), "window"))
      .select("doc_id").orderBy("doc_id")
    val lp = q.queryExecution.optimizedPlan
    val semis = lp.collect { case j: Join if j.joinType == LeftSemi => j }
    assert(semis.nonEmpty, s"expected LeftSemi join in:\n$lp")
    val residue = lp.collect { case f: Filter
      if f.condition.exists(_.isInstanceOf[GraftMatch]) => f }
    assert(residue.isEmpty, s"graft_match survived the rewrite:\n$lp")
    assert(q.as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSeq
      == Seq(1L, 2L, 4L))
  }

  test("mixed condition keeps the non-indexable conjunct as residual filter") {
    IndexRewrite.install(spark)
    val key = "spec:residual"
    registerFixtureIndex(key)
    val q = fixture.filter(IndexRewrite.graftMatch(key, col("text"), "window")
        && col("doc_id") % 2 === 0)
      .select("doc_id").orderBy("doc_id")
    val lp = q.queryExecution.optimizedPlan
    assert(lp.collect { case j: Join if j.joinType == LeftSemi => j }.nonEmpty)
    // the modulo conjunct must still constrain the output
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(2L, 4L))
  }

  test("two indexed conjuncts stack two semi-joins (AND of two terms)") {
    IndexRewrite.install(spark)
    val key = "spec:two"
    registerFixtureIndex(key)
    val q = fixture.filter(IndexRewrite.graftMatch(key, col("text"), "window")
        && IndexRewrite.graftMatch(key, col("text"), "fox"))
      .select("doc_id")
    val lp = q.queryExecution.optimizedPlan
    assert(lp.collect { case j: Join if j.joinType == LeftSemi => j }.size == 2,
      s"expected two stacked semi-joins in:\n$lp")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(4L))
  }

  test("unregistered key falls back to scan-side eval with correct semantics") {
    IndexRewrite.install(spark)
    val q = fixture.filter(IndexRewrite.graftMatch("spec:absent", col("text"), "window"))
      .select("doc_id").orderBy("doc_id")
    val lp = q.queryExecution.optimizedPlan
    assert(lp.collect { case j: Join if j.joinType == LeftSemi => j }.isEmpty,
      "no index registered — must not rewrite")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L),
      "fallback eval must tokenize (case-insensitive, punctuation-split)")
  }

  test("derived text argument is not rewritten (no index over substring(text))") {
    IndexRewrite.install(spark)
    val key = "spec:derived"
    registerFixtureIndex(key)
    val q = fixture.filter(
      IndexRewrite.graftMatch(key, substring(col("text"), 1, 9), "window"))
      .select("doc_id").orderBy("doc_id")
    val lp = q.queryExecution.optimizedPlan
    assert(lp.collect { case j: Join if j.joinType == LeftSemi => j }.isEmpty,
      "index covers the raw column, not a derived expression — must scan-eval")
    // docs whose FIRST 9 chars contain 'window' (1: "a window ",
    // 2: "window Wi", 4: "window ag") — doc 0's fox-only prefix drops out
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
  }

  test("OR of indexed terms rewrites to ONE semi-join over the unioned lists") {
    IndexRewrite.install(spark)
    val key = "spec:or"
    registerFixtureIndex(key)
    val q = fixture.filter(IndexRewrite.graftMatch(key, col("text"), "window")
        || IndexRewrite.graftMatch(key, col("text"), "fox"))
      .select("doc_id").orderBy("doc_id")
    val lp = q.queryExecution.optimizedPlan
    assert(lp.collect { case j: Join if j.joinType == LeftSemi => j }.size == 1,
      s"expected a single unioned semi-join in:\n$lp")
    // union semantics: docs 0,4 have fox; 1,2,4 have window
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 4L))
  }

  test("OR with a non-indexable leaf stays a scan filter (no partial rewrite)") {
    IndexRewrite.install(spark)
    val key = "spec:ormixed"
    registerFixtureIndex(key)
    val q = fixture.filter(IndexRewrite.graftMatch(key, col("text"), "window")
        || col("doc_id") === 0)
      .select("doc_id").orderBy("doc_id")
    val lp = q.queryExecution.optimizedPlan
    assert(lp.collect { case j: Join if j.joinType == LeftSemi => j }.isEmpty,
      "a disjunction is only index-answerable if EVERY leaf is")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 4L))
  }

  test("phrase predicate rewrites via phraseLookup; without one it scan-evals") {
    IndexRewrite.install(spark)
    val key = "spec:phrase"
    // phraseLookup computed from the fixture by the same sliding rule the
    // positional index satisfies by construction
    val phraseEval = udf { (text: String, phrase: String) =>
      val needle = graft.core.Tokenizer.terms(phrase)
      needle.nonEmpty && graft.core.Tokenizer.terms(text)
        .sliding(needle.length).exists(_.sameElements(needle))
    }
    IndexCatalog.register(key, "doc_id",
      term => fixture.filter(array_contains(ops.TextOps.tokens(col("text")), term))
        .select("doc_id"),
      phraseLookup = Some(terms =>
        fixture.filter(phraseEval(col("text"), lit(terms.mkString(" "))))
          .select("doc_id")))
    val q = fixture.filter(IndexRewrite.graftPhrase(key, col("text"), "Window, over!"))
      .select("doc_id").orderBy("doc_id")
    val lp = q.queryExecution.optimizedPlan
    assert(lp.collect { case j: Join if j.joinType == LeftSemi => j }.nonEmpty,
      s"phrase must rewrite when a phraseLookup is registered:\n$lp")
    // tokenizer-normalized adjacency: only doc 1 has "window over"
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // an entry WITHOUT phraseLookup leaves the predicate on the scan,
    // with identical results from the fallback eval
    val key2 = "spec:phrase-noidx"
    registerFixtureIndex(key2)
    val q2 = fixture.filter(IndexRewrite.graftPhrase(key2, col("text"), "window over"))
      .select("doc_id").orderBy("doc_id")
    assert(q2.queryExecution.optimizedPlan
      .collect { case j: Join if j.joinType == LeftSemi => j }.isEmpty)
    assert(q2.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("NOT graft_match rewrites to LeftAnti with exact null-text semantics") {
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    IndexRewrite.install(spark)
    val key = "spec:not"
    // null-text row on disk: scan-eval of NOT graft_match(null) is null
    // (dropped) — the rewrite must not resurrect it
    val p = java.nio.file.Files.createTempDirectory("graft_ixrn").toString + "/docs"
    val s = spark
    import s.implicits._
    Seq[(Long, String)]((0L, "fox"), (1L, "window here"), (2L, "plain"))
      .toDF("doc_id", "text")
      .unionAll(Seq(3L).toDF("doc_id").select(col("doc_id"),
        lit(null).cast("string").as("text")))
      .write.mode("overwrite").parquet(p)
    val d = spark.read.parquet(p)
    IndexCatalog.register(key, "doc_id", term =>
      d.filter(array_contains(ops.TextOps.tokens(col("text")), term)).select("doc_id"))
    val q = d.filter(!IndexRewrite.graftMatch(key, col("text"), "window"))
      .select("doc_id").orderBy("doc_id")
    val lp = q.queryExecution.optimizedPlan
    assert(lp.collect { case j: Join if j.joinType == LeftAnti => j }.nonEmpty,
      s"expected LeftAnti in:\n$lp")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(0L, 2L),
      "doc 1 matches (excluded); doc 3 has null text (dropped, not resurrected)")
    // NOT (a OR b): BooleanSimplification De Morgans it upstream into
    // NOT a AND NOT b, so two stacked anti-joins land — same semantics
    val q2 = d.filter(!(IndexRewrite.graftMatch(key, col("text"), "window")
        || IndexRewrite.graftMatch(key, col("text"), "fox")))
      .select("doc_id").orderBy("doc_id")
    assert(q2.queryExecution.optimizedPlan
      .collect { case j: Join if j.joinType == LeftAnti => j }.size == 2)
    assert(q2.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("graded x1 query matches the naive scan on sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(sfDir).exists(), s"$sfDir not present")
    val got = SparkEntry.queries("x1_match_rewrite")(spark, sfDir)
    val lp = got.queryExecution.optimizedPlan
    assert(lp.collect { case j: Join if j.joinType == LeftSemi => j }.nonEmpty,
      s"x1 must run through the index rewrite:\n$lp")
    // the rewrite's whole point at scale: with graft_match gone, the
    // corpus scan must not read the text column (install() appends a
    // ColumnPruning re-pass after the late-batch rewrite). AQE hides the
    // scan nodes until execution, so assert on the printed plan: the
    // FIRST FileScan (the semi-join's probe side, printed before the
    // BroadcastExchange subtree) must read doc_id alone.
    val firstScan = got.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan parquet"))
    assert(firstScan.exists(l =>
      l.contains("ReadSchema: struct<doc_id:bigint>") && !l.contains("text")),
      s"corpus scan must be pruned to doc_id, got:\n${firstScan.getOrElse("<none>")}")
    val naive = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(array_contains(ops.TextOps.tokens(col("text")), "window")
        && col("doc_id") % 3 === 0)
      .select("doc_id").orderBy("doc_id")
    assert(got.collect().map(_.getLong(0)).toSeq
      == naive.collect().map(_.getLong(0)).toSeq)
    assert(got.count() > 0, "probe term must occur in the corpus")
  }

  test("graft_contains rewrites via the trigram index; scan-evals without one") {
    import graft.index.TrigramIndex
    IndexRewrite.install(spark)
    val s = spark
    import s.implicits._
    val blocks = TrigramIndex.buildBlocks(fixture, "doc_id", "text").cache()
    val stats = TrigramIndex.triStats(blocks).as[(String, Long)].collect().toMap
    val key = "spec:contains"
    IndexCatalog.register(key, "doc_id", term =>
      fixture.filter(array_contains(ops.TextOps.tokens(col("text")), term))
        .select("doc_id"),
      containsLookup = Some(n =>
        TrigramIndex.substringSearch(fixture, blocks, stats, n)))
    // substring straddles "window over": only doc 1; mixed residual kept
    val q = fixture.filter(IndexRewrite.graftContains(key, col("text"), "ndow ov")
        && col("doc_id") >= 0)
      .select("doc_id").orderBy("doc_id")
    val lp = q.queryExecution.optimizedPlan
    assert(lp.collect { case j: Join if j.joinType == LeftSemi => j }.nonEmpty,
      s"expected LeftSemi join in:\n$lp")
    val residue = lp.collect { case f: Filter
      if f.condition.exists(_.isInstanceOf[graft.plans.GraftContains]) => f }
    assert(residue.isEmpty, s"graft_contains survived the rewrite:\n$lp")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // raw-substring semantics are case-sensitive both paths
    val cased = fixture.filter(IndexRewrite.graftContains(key, col("text"), "Window"))
      .select("doc_id")
    assert(cased.collect().map(_.getLong(0)).toSeq == Seq(2L))
    // no containsLookup registered → scan-side eval, same rows
    val key2 = "spec:contains-noidx"
    registerFixtureIndex(key2)
    val q2 = fixture.filter(IndexRewrite.graftContains(key2, col("text"), "ndow ov"))
      .select("doc_id")
    assert(q2.queryExecution.optimizedPlan
      .collect { case j: Join => j }.isEmpty)
    assert(q2.collect().map(_.getLong(0)).toSeq == Seq(1L))
    blocks.unpersist(false)
  }
}
