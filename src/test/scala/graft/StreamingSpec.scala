package graft

import graft.core.Oracle
import graft.corpus.CorpusGen
import graft.query.Searcher
import graft.streaming.StreamingIndexer
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Incremental (Structured Streaming) indexing: two micro-batches become two
  * segments; the loaded index must behave exactly like a single-JVM oracle
  * over the same docs in arrival order. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val root = java.nio.file.Files.createTempDirectory("graft_stream").toString

  override def afterAll(): Unit = {
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("streamed segments equal oracle over arrival-ordered docs") {
    import spark.implicits._
    val in = s"$root/in"
    val ix = s"$root/ix"
    val cp = s"$root/cp"
    // batch 1: docs 0..299 of the seed-42 corpus; batch 2: docs 300..499
    val all = (0L until 500L).map(id => CorpusGen.row(42L, id))
    def write(range: Seq[(String, String, String, String, String)], part: Int): Unit =
      range.toDF("repo", "path", "commit", "lang", "content")
        .withColumn("sha256", org.apache.spark.sql.functions.sha2(
          org.apache.spark.sql.functions.col("content"), 256))
        .coalesce(1).write.mode("append").parquet(in)

    write(all.take(300), 1)
    val q = StreamingIndexer.start(spark, in, ix, cp, partitions = 4)
    q.processAllAvailable()
    val mid = StreamingIndexer.committedDocs(ix)
    assert(mid == 300)

    write(all.drop(300), 2)
    q.processAllAvailable()
    q.stop()
    assert(StreamingIndexer.committedDocs(ix) == 500)

    // oracle: same docs, arrival order = batch1 sorted(repo,path) then batch2
    val ordered =
      all.take(300).sortBy(r => (r._1, r._2)) ++ all.drop(300).sortBy(r => (r._1, r._2))
    val oracle = new Oracle.Index(ordered.zipWithIndex.map { case (r, i) => Oracle.Doc(i, r._5) })

    val loaded = Searcher.load(spark, ix)
    assert(loaded.nDocs == 500)
    assert(math.abs(loaded.avgLen - oracle.avgLen) < 1e-9)
    Seq(Seq("if"), Seq("if", "return"), Seq("hash", "seed", "mask")).foreach { terms =>
      val got = Searcher.search(loaded, terms, 10).collect().sortBy(_.rank)
      val want = Oracle.search(oracle, terms, 10)
      assert(got.map(_.docId).toSeq == want.map(_.docId), s"mismatch for $terms")
      got.zip(want).foreach { case (g, w) => assert(math.abs(g.score - w.score) < 1e-9) }
    }
  }

  test("re-running a committed segment is a no-op (idempotent)") {
    import spark.implicits._
    val ixDir = s"$root/ix"
    val before = StreamingIndexer.committedDocs(ixDir)
    val dummy = Seq(("r", "p", "c", "scala", "if return")).toDF("repo", "path", "commit", "lang", "content")
    StreamingIndexer.appendSegment(spark, dummy, ixDir, segId = 0) // seg 0 already committed
    assert(StreamingIndexer.committedDocs(ixDir) == before)
  }

  test("streamed segments carry bloom: phrase parity with the store visible") {
    val ixDir = s"$root/ix"
    assume(StreamingIndexer.committedSegments(ixDir).size >= 2)
    StreamingIndexer.committedSegments(ixDir).foreach { s =>
      assert(new java.io.File(s"$ixDir/bloom/seg=$s").exists(), s"no bloom for seg $s")
    }
    val loaded = Searcher.load(spark, ixDir)
    assert(loaded.bloom.isDefined, "segmented bloom store not visible to the searcher")
    val all = (0L until 500L).map(id => CorpusGen.row(42L, id))
    val ordered =
      all.take(300).sortBy(r => (r._1, r._2)) ++ all.drop(300).sortBy(r => (r._1, r._2))
    val oracle = new Oracle.Index(ordered.zipWithIndex.map { case (r, i) => Oracle.Doc(i, r._5) })
    Seq(Seq("if", "return"), Seq("return", "val")).foreach { p =>
      val got = Searcher.search(loaded, p, 10, phrase = true, bloomFactor = 1)
        .collect().sortBy(_.rank)
      val want = Oracle.search(oracle, p, 10, phrase = true)
      assert(got.map(_.docId).toSeq == want.map(_.docId), s"streamed bloom phrase $p")
      got.zip(want).foreach { case (g, w) => assert(math.abs(g.score - w.score) < 1e-9) }
    }
  }

  test("compaction merges segments: identical results, fewer segment dirs") {
    import spark.implicits._
    val ixDir = s"$root/ix"
    // depends on the stream test having built 2 segments
    assume(StreamingIndexer.committedSegments(ixDir).size >= 2)
    val all = (0L until 500L).map(id => CorpusGen.row(42L, id))
    val ordered =
      all.take(300).sortBy(r => (r._1, r._2)) ++ all.drop(300).sortBy(r => (r._1, r._2))
    val oracle = new Oracle.Index(ordered.zipWithIndex.map { case (r, i) => Oracle.Doc(i, r._5) })
    val queries = Seq(Seq("if"), Seq("if", "return"), Seq("hash", "seed", "mask"))
    val before = queries.map { terms =>
      Searcher.search(Searcher.load(spark, ixDir), terms, 10).collect().sortBy(_.rank).toSeq
    }
    def segDirs(stage: String): Int = {
      val d = new java.io.File(s"$ixDir/$stage")
      if (!d.exists()) 0 else d.listFiles().count(_.getName.startsWith("seg="))
    }
    val dirsBefore = segDirs("postings")
    StreamingIndexer.compact(spark, ixDir, partitions = 4)
    assert(StreamingIndexer.committedSegments(ixDir).size == 1)
    assert(segDirs("postings") == 1 &&
      segDirs("termstats") == 1 && segDirs("docstore") == 1)
    assert(segDirs("bloom") == 1, "compaction must carry and retire bloom segments")
    assert(segDirs("postings") < dirsBefore)
    val loaded = Searcher.load(spark, ixDir)
    assert(loaded.nDocs == 500)
    queries.zip(before).foreach { case (terms, want) =>
      val got = Searcher.search(loaded, terms, 10).collect().sortBy(_.rank).toSeq
      assert(got.map(_.docId) == want.map(_.docId), s"compaction changed results for $terms")
      got.zip(want).foreach { case (g, w) => assert(math.abs(g.score - w.score) < 1e-9) }
      // and still oracle-identical
      val o = Oracle.search(oracle, terms, 10)
      assert(got.map(_.docId) == o.map(_.docId).toSeq)
    }
    // phrase path (positions blobs survived the re-encode)
    val gotP = Searcher.search(loaded, Seq("if", "return"), 10, phrase = true)
      .collect().sortBy(_.rank)
    val wantP = Oracle.search(oracle, Seq("if", "return"), 10, phrase = true)
    assert(gotP.map(_.docId).toSeq == wantP.map(_.docId))
  }

  test("tiered compaction merges only small segments, keeps settled ones") {
    import spark.implicits._
    val ixDir = s"$root/ix"
    assume(StreamingIndexer.committedSegments(ixDir).size == 1) // the 500-doc compacted seg
    val bigSeg = StreamingIndexer.committedSegments(ixDir).head
    // two small appends (20 docs each) on top of the settled big segment
    val extraA = (1000L until 1020L).map(id => CorpusGen.row(43L, id))
    val extraB = (1020L until 1040L).map(id => CorpusGen.row(43L, id))
    def df(rows: Seq[(String, String, String, String, String)]) =
      rows.toDF("repo", "path", "commit", "lang", "content")
        .withColumn("sha256", org.apache.spark.sql.functions.sha2(
          org.apache.spark.sql.functions.col("content"), 256))
    StreamingIndexer.appendSegment(spark, df(extraA), ixDir, segId = bigSeg + 1, partitions = 2)
    StreamingIndexer.appendSegment(spark, df(extraB), ixDir, segId = bigSeg + 2, partitions = 2)
    assert(StreamingIndexer.committedDocs(ixDir) == 540)
    // tiered: only the two 20-doc segments qualify (threshold 100)
    StreamingIndexer.compact(spark, ixDir, partitions = 2, maxDocsToMerge = 100L)
    val after = StreamingIndexer.committedSegments(ixDir)
    assert(after.size == 2 && after.contains(bigSeg), s"segments after tiered: $after")
    assert(StreamingIndexer.committedDocs(ixDir) == 540)
    // results still oracle-identical over all 540 docs in arrival order
    val all = (0L until 500L).map(id => CorpusGen.row(42L, id))
    val ordered = all.take(300).sortBy(r => (r._1, r._2)) ++
      all.drop(300).sortBy(r => (r._1, r._2)) ++
      extraA.sortBy(r => (r._1, r._2)) ++ extraB.sortBy(r => (r._1, r._2))
    val oracle = new Oracle.Index(ordered.zipWithIndex.map { case (r, i) => Oracle.Doc(i, r._5) })
    val loaded = Searcher.load(spark, ixDir)
    assert(loaded.nDocs == 540)
    Seq(Seq("if"), Seq("if", "return"), Seq("hash", "seed")).foreach { terms =>
      val got = Searcher.search(loaded, terms, 10).collect().sortBy(_.rank)
      val want = Oracle.search(oracle, terms, 10)
      assert(got.map(_.docId).toSeq == want.map(_.docId), s"tiered mismatch $terms")
      got.zip(want).foreach { case (g, w) => assert(math.abs(g.score - w.score) < 1e-9) }
    }
  }

  test("crash window: sources with live manifests are excluded via compactedFrom") {
    // simulate a crash between the compacted manifest's publish and the
    // source-manifest deletion: all three manifests exist on disk — readers
    // must see ONLY the compacted segment, and the doc watermark must hold
    val dir = java.nio.file.Files.createTempDirectory("graft_crash").toString
    def writeManifest(seg: Long, json: String): Unit =
      java.nio.file.Files.writeString(
        graft.index.Manifest.manifestPath(dir, s"segment_$seg"), json)
    writeManifest(0, """{"segment":0,"docs":10,"docsAfter":10}""")
    writeManifest(1, """{"segment":1,"docs":10,"docsAfter":20}""")
    writeManifest(2, """{"segment":2,"docs":20,"docsAfter":20,"compactedFrom":[0, 1]}""")
    assert(graft.index.Manifest.committedSegments(dir) == Seq(2L))
    assert(StreamingIndexer.committedDocs(dir) == 20)
    // transitivity: a later compaction of the compacted segment keeps the
    // original sources retired even if every manifest survives the crash
    writeManifest(3, """{"segment":3,"docs":25,"docsAfter":25,"compactedFrom":[2]}""")
    assert(graft.index.Manifest.committedSegments(dir) == Seq(3L))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
