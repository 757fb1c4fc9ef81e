package graft

import graft.index.Bloom
import graft.ops.{Dedup, Multimodal, Similarity, Sketch, TextOps}
import graft.query.Highlighter
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class BloomSpec extends AnyFunSuite {
  test("sizing matches standard formulas") {
    val (m, k) = Bloom.sizing(5, 0.0009)
    assert(m > 5 && k >= 1 && k <= 16)
    // exact goldens at the reference config (n=5, p=9e-4): 73 bits → 10
    // bytes, 10 hashes — pinned because the idx_bloom_stats oracle carries
    // them as literals
    assert((m, k) == (73, 10))
    assert(Bloom.newFilter().bits.length == 10)
  }

  test("no false negatives; fp rate sane") {
    val f = Bloom.newFilter()
    val in = Seq("if", "return", "foo_bar", "x1")
    in.foreach(f.add)
    in.foreach(t => assert(f.mightContain(t)))
    val probes = (0 until 2000).map(i => s"absent_$i")
    val fps = probes.count(f.mightContain)
    assert(fps < 100, s"fp count $fps too high") // ~0.09% expected, allow slack
  }

  test("murmur2 is deterministic and spreads") {
    val h1 = Bloom.murmur2("hello".getBytes, 1)
    assert(h1 == Bloom.murmur2("hello".getBytes, 1))
    assert(h1 != Bloom.murmur2("hellp".getBytes, 1))
  }
}

class HighlighterSpec extends AnyFunSuite {
  test("sentence segmentation covers text") {
    val t = "One two. Three four! Five"
    val s = Highlighter.sentences(t)
    assert(s.length == 3)
    assert(s.head == (0, 8))
    assert(t.substring(s(2)._1, s(2)._2) == "Five")
  }

  test("snippet bolds matched terms and picks matching passages") {
    val t = "nothing here. the quick fox jumps. unrelated tail."
    val sn = Highlighter.snippet(t, Set("fox", "quick"), 1)
    assert(sn.contains("<b>quick</b>"))
    assert(sn.contains("<b>fox</b>"))
    assert(!sn.contains("nothing"))
  }

  test("passage scoring prefers denser match, ties to earlier") {
    val t = "fox alone in a long sentence with many words here. fox fox dense."
    val ps = Highlighter.topPassages(t, Set("fox"), 1)
    assert(t.substring(ps.head.start, ps.head.end).contains("dense"))
  }
}

class SimhashSpec extends AnyFunSuite {
  test("simhash is deterministic, near-dup similar, distinct different") {
    val a = graft.core.Tokenizer.terms("the quick brown fox jumps over the lazy dog repeatedly")
    val b = graft.core.Tokenizer.terms("the quick brown fox jumps over the lazy cat repeatedly")
    val c = graft.core.Tokenizer.terms("completely unrelated content about spark query engines")
    val (ha, hb, hc) = (Dedup.simhash60(a), Dedup.simhash60(b), Dedup.simhash60(c))
    assert(ha == Dedup.simhash60(a))
    assert(Dedup.hamming60(ha, hb) < Dedup.hamming60(ha, hc))
  }

  test("winnowing fingerprints overlap for shared content") {
    val base = ("alpha beta gamma delta epsilon zeta eta theta " * 4).trim
    val a = TextOps.winnowingFingerprints(graft.core.Tokenizer.terms(base + " tail one"))
    val b = TextOps.winnowingFingerprints(graft.core.Tokenizer.terms(base + " other end"))
    assert(a.intersect(b).nonEmpty)
    val c = TextOps.winnowingFingerprints(graft.core.Tokenizer.terms(
      "nothing shared at all between these two documents right"))
    assert(a.intersect(c).isEmpty)
  }
}

class SniffSpec extends AnyFunSuite {
  import graft.ops.Multimodal.{sniffHeader, syntheticHeader, SniffResult}

  test("synthetic fixtures roundtrip: format, dims and length match the id formulas") {
    (0L until 64L).foreach { id =>
      val p = syntheticHeader(id)
      val r = sniffHeader(p)
      val expFmt = (id % 6) match {
        case 0 => "png"; case 1 => "jpeg"; case 2 => "gif"
        case 3 => "bmp"; case 4 => "wav"; case _ => "unknown"
      }
      assert(r.format == expFmt, s"id=$id")
      if (id % 6 <= 3) {
        assert(r.width == 1 + (id % 1023).toInt, s"id=$id width")
        assert(r.height == 1 + ((id * 7) % 769).toInt, s"id=$id height")
      } else assert(r.width == 0 && r.height == 0)
      val expLen = (id % 6) match {
        case 0 => 33; case 1 => 43 + (id % 32).toInt; case 2 => 13
        case 3 => 54; case _ => 12
      }
      assert(p.length == expLen, s"id=$id length")
    }
  }

  test("truncated and malformed headers degrade to unknown, never throw") {
    (0L until 12L).foreach { id =>
      val p = syntheticHeader(id)
      (0 until p.length).foreach { cut =>
        val r = sniffHeader(java.util.Arrays.copyOf(p, cut))
        assert(r != null) // no exception; format may legitimately resolve early
      }
    }
    assert(sniffHeader(Array.empty[Byte]) == SniffResult("unknown", 0, 0))
    assert(sniffHeader(Array.fill[Byte](64)(0xff.toByte)).format != "png")
  }

  test("dimension byte order: >255 values parse on all container formats") {
    // id chosen so width and height exceed one byte
    val id = 300L // w = 301, h = 2101 % 769 = 563
    (0L until 4L).foreach { k =>
      val fid = id * 6 + k // same residues mod 6 = k
      val p = syntheticHeader(fid)
      val r = sniffHeader(p)
      assert(r.width == 1 + (fid % 1023).toInt && r.height == 1 + ((fid * 7) % 769).toInt,
        s"fid=$fid kind=$k got=$r")
    }
  }

  test("AV probe: WAV fmt/data walk and MP4 box walk match the fixture formulas") {
    import graft.ops.Multimodal.{probeAv, syntheticAvHeader}
    (0L until 96L).foreach { id =>
      val r = probeAv(syntheticAvHeader(id))
      (id % 3) match {
        case 0 =>
          val sr = 8000L * (1 + id % 5); val ch = 1 + id % 2
          assert(r.format == "wav" && r.sample_rate == sr && r.channels == ch, s"id=$id $r")
          assert(r.duration_ms == (1 + id % 100) * 1024L * 1000L / (sr * ch * 2), s"id=$id dur")
        case 1 =>
          assert(r.format == "mp4", s"id=$id $r")
          assert(r.width == 16L * (1 + id % 120) && r.height == 16L * (1 + (id * 3) % 68),
            s"id=$id dims $r")
          assert(r.duration_ms == (1 + id % 1000) * 60L * 1000L / (600L * (1 + id % 4)),
            s"id=$id dur $r")
        case _ => assert(r.format == "unknown", s"id=$id $r")
      }
    }
  }

  test("AV probe: truncation, garbage and hostile declared sizes never throw") {
    import graft.ops.Multimodal.{probeAv, syntheticAvHeader}
    (0L until 6L).foreach { id =>
      val p = syntheticAvHeader(id)
      (0 until p.length).foreach { cut =>
        assert(probeAv(java.util.Arrays.copyOf(p, cut)) != null)
      }
    }
    assert(probeAv(Array.empty[Byte]).format == "unknown")
    // RIFF/WAVE with a chunk whose declared size is 0xFFFFFFFF: walk must
    // terminate without overflow (cursor advance saturates past the array)
    val hostile = java.nio.ByteBuffer.allocate(24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hostile.put("RIFF".getBytes).putInt(-1).put("WAVE".getBytes)
    hostile.put("junk".getBytes).putInt(-1).putInt(0)
    assert(probeAv(hostile.array()).format == "unknown")
    // a WAV whose fmt chunk claims a byteRate of 0 must not divide by zero
    val zr = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    zr.put("RIFF".getBytes).putInt(36).put("WAVE".getBytes)
    zr.put("fmt ".getBytes).putInt(16)
    zr.putShort(1.toShort).putShort(1.toShort).putInt(0).putInt(0)
      .putShort(2.toShort).putShort(16.toShort)
    zr.put("data".getBytes).putInt(0)
    assert(probeAv(zr.array()).format == "unknown")
  }
}

class OpsSparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (2L, "spark sql engines compile queries into whole stage generated java code"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
      (4L, "unrelated short text")
    ).toDF("doc_id", "text")
  }

  test("subtokens: camelCase, snake_case, acronym runs, digits") {
    import spark.implicits._
    def st(s: String) = TextOps.subtokens(s).toSeq
    assert(st("fooBar") == Seq("foo", "bar"))
    assert(st("foo_bar") == Seq("foo", "bar"))
    assert(st("HTTPServer") == Seq("http", "server"))
    assert(st("parseHTTPResponse") == Seq("parse", "http", "response"))
    assert(st("utf8Decoder") == Seq("utf8", "decoder"))
    assert(st("__init__") == Seq("init"))
    assert(st("XMLHttpRequest") == Seq("xml", "http", "request"))
    assert(st("a") == Seq("a"))
    // Column form produces the identical split
    val got = Seq("fooBar", "HTTPServer", "parseHTTPResponse", "__init__")
      .toDF("i").select(TextOps.subtokensCol(col("i"))).as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("foo", "bar"), Seq("http", "server"),
      Seq("parse", "http", "response"), Seq("init")))
  }

  test("dupSpans: exact interval union of cross-doc duplicated 5-grams") {
    import spark.implicits._
    val rows = Dedup.dupSpans(docs, "text", "doc_id", n = 5)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // doc0/doc3 identical (14 tokens, 10 5-grams): fully covered.
    // doc1 shares tokens 0..12 with them -> 9 duplicated grams at pos 0..8,
    // union [0,13) = 13 of 14 tokens. doc2/doc4 have no duplicated gram and
    // are absent (a doc with zero duplication carries no row by contract).
    assert(rows == Seq(
      (0L, 10L, 14L, 14L, 1000000L),
      (1L, 9L, 13L, 14L, 928571L),
      (3L, 10L, 14L, 14L, 1000000L)))
  }

  test("synthesize draws popularity-proportional deterministic queries") {
    import spark.implicits._
    // cf: a=50, b=30, c=20 (total 100); Q=10 ⇒ targets (2q+1)·5 = 5,15,…,95
    // ⇒ exactly 5 a-queries (cum [0,50)), 3 b ([50,80)), 2 c ([80,100))
    val tf = Seq((0L, "a", 50L), (1L, "b", 30L), (2L, "c", 20L))
      .toDF("doc_id", "term", "tf")
    val out = graft.query.QueryLog.synthesize(tf, nQueries = 10, partitions = 3)
      .as[(Long, String, Long)].collect()
    assert(out.length == 10)
    assert(out.map(_._1).toSeq == (0L until 10L))
    val byTerm = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byTerm == Map("a" -> 5, "b" -> 3, "c" -> 2))
    // deterministic under a different parallelism (the two-pass scan is
    // partition-boundary independent)
    val out2 = graft.query.QueryLog.synthesize(tf, nQueries = 10, partitions = 1)
      .as[(Long, String, Long)].collect()
    assert(out.toSeq == out2.toSeq)
  }

  test("exact dedup groups duplicates") {
    import spark.implicits._
    val g = Dedup.exactGroups(docs, "text", "doc_id")
      .filter($"n_dups" > 1).as[(String, Long, Long, Seq[Long])].collect()
    assert(g.length == 1)
    assert(g.head._3 == 0L && g.head._4 == Seq(0L, 3L))
  }

  test("minhash LSH finds near-dup pair, jaccard confirms") {
    import spark.implicits._
    val cand = Dedup.minhashCandidates(docs, "text", "doc_id", n = 3, sigLen = 8, bands = 4)
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((0L, 3L))) // exact dups always collide
    assert(cand.contains((0L, 1L)) || cand.contains((1L, 3L)), s"near-dup missed: $cand")
    val j = Dedup.ngramJaccard(cand.toSeq.toDF("id_a", "id_b"), docs, "text", "doc_id")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(j((0L, 3L)) == 1000000L)
  }

  test("connected components: chains need multiple rounds, stars one") {
    import spark.implicits._
    val pairs = Seq(
      (1L, 2L), (2L, 3L),                                         // path of 3
      (10L, 11L),                                                 // lone pair
      (30L, 31L), (31L, 32L), (32L, 33L), (33L, 34L), (34L, 35L), // chain of 6
      (40L, 41L), (40L, 42L), (40L, 43L)                          // star
    ).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L).forall(cc(_) == 1L))
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert((30L to 35L).forall(cc(_) == 30L), s"chain not converged: $cc")
    assert((40L to 43L).forall(cc(_) == 40L))
    assert(cc.size == 15) // only paired ids appear; singletons are absent
    // the distributed propagation loop (localEdgeLimit=0 forces it) must
    // produce the identical labeling as the size-gated local union-find
    val dist = Dedup.connectedComponents(pairs, localEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(dist == cc, s"local vs distributed components differ: $dist vs $cc")
  }

  test("components over LSH candidates cluster the near-dup group") {
    import spark.implicits._
    val cand = Dedup.minhashCandidates(docs, "text", "doc_id", n = 3, sigLen = 8, bands = 4)
    val cc = Dedup.connectedComponents(cand).as[(Long, Long)].collect().toMap
    // docs 0, 1, 3 are exact/near dups of each other -> one cluster rooted at 0
    assert(cc(3L) == 0L && cc.getOrElse(1L, 0L) == 0L)
  }

  test("contamination overlap flags docs sharing eval n-grams, counts distinct") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),  // 4 shared 3-grams with eval
      (2L, "alpha beta gamma alpha beta gamma"),    // repeated gram counts ONCE per distinct
      (3L, "totally different words here now")      // no overlap
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta eta")).toDF("doc_id", "text")
    val hits = Dedup.contaminationOverlap(corpus, eval, "text", "doc_id",
      n = 3, minShared = 2).as[(Long, Long)].collect().toMap
    assert(hits(1L) == 4L) // all 4 of doc 1's 3-grams appear in eval
    // doc 2 has distinct grams {a b g, b g a, g a b, a b g} → only "alpha beta
    // gamma" is in eval, and it must count once, below the threshold of 2
    assert(!hits.contains(2L), s"repetition inflated the overlap: $hits")
    assert(!hits.contains(3L))
    // threshold 1 admits doc 2 with exactly one distinct shared gram
    val loose = Dedup.contaminationOverlap(corpus, eval, "text", "doc_id",
      n = 3, minShared = 1).as[(Long, Long)].collect().toMap
    assert(loose(2L) == 1L)
  }

  test("collocations: PMI ranks glued pairs above independent ones") {
    import spark.implicits._
    // 'big data' always adjacent (strong collocation); 'the' floats freely
    val df = (0 until 10).map(i =>
      s"big data the pipeline $i the value big data the end").toSeq.toDF("text")
    val got = graft.ops.TextOps.collocations(df, "text", minCount = 5L, topN = 50)
      .as[(String, Long, Long)].collect()
    val byBigram = got.map(r => r._1 -> r).toMap
    assert(byBigram("big data")._2 == 20L) // 2 per doc × 10 docs
    // hand-computed PMI: U = 100 tokens... verify against a direct model
    val toksAll = df.as[String].collect().flatMap(graft.core.Tokenizer.terms)
    val u = toksAll.length.toLong
    val uni = toksAll.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bis = df.as[String].collect().flatMap { t =>
      val ts = graft.core.Tokenizer.terms(t); ts.zip(ts.tail).map(p => s"${p._1} ${p._2}")
    }
    val b = bis.length.toLong
    val bCnt = bis.groupBy(identity).view.mapValues(_.length.toLong).toMap
    got.foreach { case (bg, n, pmiMicro) =>
      val Array(w1, w2) = bg.split(" ")
      assert(n == bCnt(bg))
      val want = math.round(math.log(
        (n * u * u).toDouble / (b * uni(w1) * uni(w2)).toDouble) * 1e6)
      assert(pmiMicro == want, s"pmi mismatch for '$bg'")
    }
    // the glued pair must outrank any 'the'-anchored pair
    val thePairs = got.filter(r => r._1.startsWith("the ") || r._1.endsWith(" the"))
    assert(thePairs.nonEmpty && thePairs.forall(_._3 < byBigram("big data")._3))
    // deterministic order: (pmi desc, bigram asc)
    assert(got.sortBy(r => (-r._3, r._1)).toSeq == got.toSeq)
  }

  test("PII counts and redaction: detect, replace, leave clean text alone") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail me at jane.doe+spam@sub.example.co or admin@x.io thanks"),
      (2L, "server 192.168.0.1 and 10.0.255.3 up; version 1.2 is not an ip"),
      (3L, "call +1-555-0147 or +44-202-33444555"),
      (4L, "no pii here, just code: if (a > b) return c;")
    ).toDF("doc_id", "text")
    val counts = graft.ops.TextOps.piiCounts(df, "text", "doc_id")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(counts(1L) == ((2L, 0L, 0L)), s"emails: ${counts(1L)}")
    assert(counts(2L) == ((0L, 2L, 0L)), s"ips: ${counts(2L)}")
    assert(counts(3L) == ((0L, 0L, 2L)), s"phones: ${counts(3L)}")
    assert(counts(4L) == ((0L, 0L, 0L)))
    val red = df.select($"doc_id", graft.ops.TextOps.redactPii($"text").as("t"))
      .as[(Long, String)].collect().toMap
    assert(red(1L) == "mail me at <EMAIL> or <EMAIL> thanks")
    assert(red(2L) == "server <IP> and <IP> up; version 1.2 is not an ip")
    assert(red(3L) == "call <PHONE> or <PHONE>")
    assert(red(4L) == df.filter($"doc_id" === 4).select("text").as[String].head)
    // redacted text re-scans clean — the pass is idempotent
    val rescan = graft.ops.TextOps.piiCounts(
      df.select($"doc_id", graft.ops.TextOps.redactPii($"text").as("text")), "text", "doc_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(rescan.forall(r => r._2 == 0 && r._3 == 0 && r._4 == 0))
  }

  test("split assignment is content-keyed: exact dups share a split") {
    import spark.implicits._
    val s = TextOps.splitAssign(docs, "text", "doc_id")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(s.size == 5)
    assert(s(0L) == s(3L)) // doc 3 is the exact dup of doc 0 -> same bucket+split
    assert(s.values.forall { case (b, sp) =>
      b >= 0 && b < 100 && Set("train", "val", "test").contains(sp) })
    // re-running yields the identical assignment (determinism)
    val s2 = TextOps.splitAssign(docs, "text", "doc_id")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(s == s2)
  }

  test("simhash candidates include exact dups at hamming 0") {
    import spark.implicits._
    val c = Dedup.simhashCandidates(docs, "text", "doc_id")
      .as[(Long, Long, Int)].collect()
    assert(c.exists(r => r._1 == 0L && r._2 == 3L && r._3 == 0))
  }

  test("brute-force ANN self-similarity is 1.0") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(e, "embedding", "vec_id",
      Array(1.0, 0.0, 0.0), 3).as[(Long, Long, Int)].collect().sortBy(_._3)
    assert(top.head._1 == 0L && top.head._2 == 1000000L)
    assert(top(1)._1 == 1L)
    assert(top(2)._1 == 2L && top(2)._2 == 0L)
  }

  test("LSH near-dup finds close vectors without all-pairs") {
    import spark.implicits._
    val vecs = (0 until 50).map { i =>
      val base = if (i % 2 == 0) Array.fill(8)(1.0f) else Array.tabulate(8)(j => if (j == i % 8) 1.0f else -1.0f)
      (i.toLong, base.zipWithIndex.map { case (v, j) => v + 0.01f * ((i * 7 + j) % 3) })
    }.toDF("vec_id", "embedding")
    val exact = Similarity.exactNearDup(vecs, "embedding", "vec_id", 990000L)
      .as[(Long, Long, Long)].collect().toSet
    val lsh = Similarity.nearDupPairs(vecs, "embedding", "vec_id", 8, 990000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    // LSH recall on this clustered data should be total (identical cluster)
    assert(lsh == exact, s"lsh=${lsh.size} exact=${exact.size}")
  }

  test("IVF: trained cells separate clusters; probed top-k is exact in-cell") {
    import spark.implicits._
    // two well-separated clusters of 8-dim vectors
    val vecs = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Array.tabulate(8)(j => base + 0.001f * ((i + j) % 5)))
    }.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(vecs, "embedding", "vec_id", k = 2, iters = 3)
    assert(cents.length == 2)
    // centroids land in opposite orthants
    assert(cents(0).sum.signum != cents(1).sum.signum)
    val q = vecs.filter($"vec_id" === 0)
      .select(Similarity.quantize($"embedding")).as[Seq[Long]].head().toArray
    val ivf = Similarity.ivfTopK(vecs, "embedding", "vec_id", q,
        kTop = 5, kCells = 2, iters = 3, nprobe = 1)
      .as[(Long, Int, Long)].collect()
    val brute = Similarity.bruteForceTopK(vecs, "embedding", "vec_id",
        Array.tabulate(8)(j => (1.0f + 0.001f * (j % 5)).toDouble), 5)
      .as[(Long, Long, Int)].collect().sortBy(_._3)
    // the probed cell contains the query's whole cluster → exact top-5
    assert(ivf.map(_._1).toSeq == brute.map(_._1).toSeq,
      s"ivf=${ivf.toSeq} brute=${brute.toSeq}")
    // all results from ONE cell (nprobe=1) — the partition-pruning claim
    assert(ivf.map(_._2).distinct.length == 1)
    // recall@k: probing ALL cells makes IVF == exact by construction
    // (recall 1.0); probing only the query's cluster cell still finds its
    // whole top-5 on this separated data
    val recAll = Similarity.ivfRecallAtK(vecs, "embedding", "vec_id",
        queryIds = Seq(0L, 1L, 2L), kTop = 5, kCells = 2, iters = 3, nprobe = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(recAll.map(_._1) == Seq(0L, 1L, 2L))
    assert(recAll.forall(r => r._2 == 5L && r._3 == 1000000L), recAll.toString)
    val rec1 = Similarity.ivfRecallAtK(vecs, "embedding", "vec_id",
        queryIds = Seq(0L), kTop = 5, kCells = 2, iters = 3, nprobe = 1)
      .as[(Long, Long, Long)].collect().head
    assert(rec1._3 == 1000000L, s"cluster-local top-5 should be exact: $rec1")
    // absent query ids are skipped, not failed
    assert(Similarity.ivfRecallAtK(vecs, "embedding", "vec_id",
      queryIds = Seq(999L), kTop = 5, kCells = 2, iters = 3, nprobe = 1).count() == 0L)
  }

  test("language id picks the marker-dominant language") {
    import spark.implicits._
    val d = Seq(
      (0L, "the cat and the dog of the house"),
      (1L, "le chat et la maison les arbres des idees"),
      (2L, "zzz qqq www")).toDF("doc_id", "text")
    val out = TextOps.langId(d, "text", "doc_id")
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(out(0L) == "en" && out(1L) == "fr" && out(2L) == "unknown")
  }

  test("multimodal extract: plumbing real, decode stub deterministic") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", "fakejpegbytes".getBytes),
      Multimodal.MediaRow(2L, "video", Array[Byte](1, 2, 3, 4, 5))).toDS()
    val out = Multimodal.extract(rows).collect().sortBy(_.media_id)
    assert(out.length == 2)
    assert(out(0).n_bytes == 13)
    assert(out(0).sha256 == graft.core.Sha256.hex("fakejpegbytes"))
    assert(out(0).feature.length == 8)
    assert(math.abs(out(0).feature.sum - 1.0f) < 1e-5) // L1-normalized histogram
    val again = Multimodal.extract(rows).collect().sortBy(_.media_id)
    assert(out(0).width == again(0).width && out(1).n_frames == again(1).n_frames)
  }

  test("quality features: exact integer semantics") {
    import spark.implicits._
    val d = Seq((0L, "Hello, world! the end")).toDF("doc_id", "text")
    val r = TextOps.qualityFeatures(d, "text", "doc_id").collect().head
    assert(r.getAs[Int]("n_tokens") == 4)
    assert(r.getAs[Long]("stopword_ratio_micro") == 250000L) // 'the' 1/4
  }

  test("repetition signals: dup lines, dup trigrams, top-bigram mass") {
    import spark.implicits._
    val d = Seq(
      // 3 lines, one repeated (1/3 dup); "a b a b a b" has dup trigrams
      (0L, "a b a b a b\nx y z\na b a b a b"),
      (1L, "unique one line only")).toDF("doc_id", "text")
    val r = TextOps.repetitionSignals(d, "text", "doc_id")
      .collect().map(x => x.getLong(0) -> x).toMap
    val d0 = r(0L)
    assert(d0.getAs[Long]("n_lines") == 3L)
    assert(d0.getAs[Long]("dup_line_ratio_micro") == 333333L)
    // doc0 tokens: a b a b a b x y z a b a b a b (15 toks, 13 trigrams)
    // distinct trigrams: aba, bab, abx, bxy, xyz, yza, zab -> 7; dup = 6/13
    assert(d0.getAs[Long]("dup_trigram_ratio_micro") == math.round(6.0 / 13 * 1e6))
    // bigrams: 14 total, "a b" occurs 6 times
    assert(d0.getAs[Long]("top_bigram_ratio_micro") == math.round(6.0 / 14 * 1e6))
    val d1 = r(1L)
    assert(d1.getAs[Long]("dup_line_ratio_micro") == 0L)
    assert(d1.getAs[Long]("dup_trigram_ratio_micro") == 0L)
  }

  test("line dedup: cross-doc boilerplate dropped, unique lines kept in order") {
    import spark.implicits._
    val d = Seq(
      (0L, "alpha beta\nshared footer line\ngamma"),
      (1L, "delta\nshared footer line"),
      (2L, "epsilon only")).toDF("doc_id", "text")
    val r = TextOps.lineDedup(d, "text", "doc_id", minDocs = 2)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getAs[Long]("n_lines") == 3L && r(0L).getAs[Long]("n_dup_lines") == 1L)
    assert(r(1L).getAs[Long]("n_dup_lines") == 1L)
    assert(r(2L).getAs[Long]("n_dup_lines") == 0L)
    def sha(s: String) = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r(0L).getAs[String]("clean_sha") == sha("alpha beta\ngamma"))
    assert(r(1L).getAs[String]("clean_sha") == sha("delta"))
    assert(r(2L).getAs[String]("clean_sha") == sha("epsilon only"))
  }

  test("chunking: overlap windows cover every token, tail clamps") {
    import spark.implicits._
    val text = (1 to 150).map(i => s"w$i").mkString(" ") // 150 tokens
    val d = Seq((0L, text), (1L, "tiny doc"), (2L, "")).toDF("doc_id", "text")
    val r = TextOps.chunkDocs(d, "text", "doc_id", chunkTokens = 64, overlap = 8)
      .collect().groupBy(_.getLong(0))
    // 150 tokens, stride 56: chunks at 0/56/112 -> 3 (ceil(142/56))
    assert(r(0L).length == 3)
    val sizes = r(0L).sortBy(_.getAs[Int]("chunk_idx")).map(_.getAs[Long]("n_chunk_tokens"))
    assert(sizes.toSeq == Seq(64L, 64L, 38L)) // tail clamps at doc end
    assert(r(1L).length == 1 && r(1L).head.getAs[Long]("n_chunk_tokens") == 2L)
    assert(!r.contains(2L)) // empty doc emits nothing
    // coverage: stride 56 < 64 => consecutive chunks overlap by 8
  }

  test("packing: offsets are an exact exclusive prefix sum in hash order") {
    import spark.implicits._
    val d = (0L until 300L).map(i => (i, 10L + (i % 7))).toDF("doc_id", "n_tokens")
    val packed = TextOps.packSequences(d, "doc_id", "n_tokens", seqLen = 128L,
      partitions = 7).collect()
    assert(packed.length == 300)
    // reconstruct the expected order (bucket, id) and check offsets exactly
    val byId = packed.map(r => r.getLong(0) -> r).toMap
    val order = packed.sortBy(r => (r.getAs[Long]("offset"))).map(_.getLong(0))
    var acc = 0L
    order.foreach { id =>
      val r = byId(id)
      assert(r.getAs[Long]("offset") == acc, s"offset mismatch at doc $id")
      assert(r.getAs[Long]("bin_id") == acc / 128L)
      assert(r.getAs[Long]("bin_offset") == acc % 128L)
      acc += r.getAs[Long]("n_tokens")
    }
    // determinism: a different partition count yields identical offsets
    val packed3 = TextOps.packSequences(d, "doc_id", "n_tokens", seqLen = 128L,
      partitions = 3).collect().map(r => r.getLong(0) -> r.getAs[Long]("offset")).toMap
    packed.foreach(r => assert(packed3(r.getLong(0)) == r.getAs[Long]("offset"),
      "offsets must be partitioning-independent"))
  }

  test("sampling: stratified keep-rate determinism and quota bounds") {
    import spark.implicits._
    val d = (0L until 400L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val s1 = TextOps.stratifiedSample(d, "doc_id", "lang",
      Map("en" -> 500000L, "de" -> 100000L)).collect()
    val s2 = TextOps.stratifiedSample(d, "doc_id", "lang",
      Map("en" -> 500000L, "de" -> 100000L)).collect()
    // deterministic: identical membership across runs
    assert(s1.map(_.getLong(0)).sorted.toSeq == s2.map(_.getLong(0)).sorted.toSeq)
    val byLang = s1.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // 200 docs per stratum at 50% / 10%: expect ~100 / ~20 (binomial slack)
    assert(byLang("en") > 60 && byLang("en") < 140, s"en=${byLang("en")}")
    assert(byLang("de") > 4 && byLang("de") < 50, s"de=${byLang("de")}")
    // rate 0 strata (unknown) drop entirely
    assert(TextOps.stratifiedSample(d, "doc_id", "lang", Map("en" -> 500000L))
      .filter(col("lang") === "de").count() == 0)
    // quota: exactly `quota` per stratum, ranks 1..quota, stable under rerun
    val q1 = TextOps.quotaSample(d, "doc_id", "lang", quota = 7).collect()
    assert(q1.groupBy(_.getString(1)).forall(_._2.length == 7))
    assert(q1.map(_.getAs[Int]("rn")).sorted.toSeq == (1 to 7).flatMap(r => Seq(r, r)).sorted)
    val q2 = TextOps.quotaSample(d, "doc_id", "lang", quota = 7).collect()
    assert(q1.map(_.getLong(0)).sorted.toSeq == q2.map(_.getLong(0)).sorted.toSeq)
  }

  test("mixture sampling: exact apportionment, caps redistribute, prefix-stable") {
    import spark.implicits._
    // availability: a=10, b=4, c=6
    val d = ((0 until 10).map(i => (i.toLong, "a")) ++
      (10 until 14).map(i => (i.toLong, "b")) ++
      (14 until 20).map(i => (i.toLong, "c"))).toDF("id", "src")
    def comp(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.groupBy("src").count().as[(String, Long)].collect().toMap
    // uncapped: 10 rows at 50/30/20 parts -> exactly 5/3/2
    val m10 = TextOps.mixtureSample(d, "id", "src",
      Map("a" -> 50L, "b" -> 30L, "c" -> 20L), total = 10L)
    assert(comp(m10) == Map("a" -> 5L, "b" -> 3L, "c" -> 2L))
    // capped: 16 at equal parts -> raw 6/5/5; b holds only 4, its deficit
    // re-apportions over a and c -> 6/4/6
    val m16 = TextOps.mixtureSample(d, "id", "src",
      Map("a" -> 1L, "b" -> 1L, "c" -> 1L), total = 16L)
    assert(comp(m16) == Map("a" -> 6L, "b" -> 4L, "c" -> 6L))
    // demand beyond total capacity: everything available is taken
    assert(TextOps.mixtureSample(d, "id", "src",
      Map("a" -> 1L, "b" -> 1L, "c" -> 1L), total = 100L).count() == 20L)
    // hash-rank selection makes per-source membership a PREFIX: growing the
    // budget never evicts a previously selected row of the same source
    val ids10 = m10.filter(col("src") === "a").select("id").as[Long].collect().toSet
    val ids16 = m16.filter(col("src") === "a").select("id").as[Long].collect().toSet
    assert(ids10.subsetOf(ids16))
    // unknown sources are ignored, not sampled
    assert(TextOps.mixtureSample(d, "id", "src",
      Map("a" -> 1L, "zz" -> 1L), total = 8L)
      .filter(col("src") =!= "a").count() == 0L)
  }

  test("KMV distinct sketch: exact below k, sane estimate above, duplicate-invariant") {
    val s = spark
    import s.implicits._
    // 10 distinct values, k=64 → exact path
    val small = (1 to 10).map(i => s"v$i").toDF("v")
    val r1 = Sketch.kmvDistinct(small, "v", 64).collect().head
    assert(r1.getAs[Long]("est_distinct") == 10L)
    assert(r1.getAs[Long]("exact_distinct") == 10L)
    // 5000 distinct values, k=64 → estimator path, within 35% (k=64 gives
    // ~12.5% stdev; this is a determinism check, not a statistics test)
    val big = (1 to 5000).map(i => s"value_$i").toDF("v")
    val r2 = Sketch.kmvDistinct(big, "v", 64).collect().head
    val est = r2.getAs[Long]("est_distinct")
    assert(est > 3250 && est < 6750, s"estimate $est implausible for 5000")
    // duplicates never change a distinct sketch
    val dup = big.unionAll(big).unionAll(big)
    assert(Sketch.kmvDistinct(dup, "v", 64).collect().head
      .getAs[Long]("est_distinct") == est)
  }

  test("HLL distinct sketch: LC small-range path, sane estimate, duplicate-invariant") {
    val s = spark
    import s.implicits._
    // 12 distinct values: raw estimate is tiny → linear-counting path
    val small = (1 to 12).map(i => s"v$i").toDF("v")
    val r1 = Sketch.hllDistinct(small, "v").collect().head
    assert(r1.getAs[Long]("exact_distinct") == 12L)
    assert(r1.getAs[Long]("v_zero") >= 52L) // ≤12 of 64 registers touched
    val lc = r1.getAs[Long]("est_distinct")
    assert(lc >= 8 && lc <= 16, s"LC estimate $lc implausible for 12")
    // 5000 distinct: estimator path, m=64 → ~13% stdev; allow wide band
    val big = (1 to 5000).map(i => s"value_$i").toDF("v")
    val r2 = Sketch.hllDistinct(big, "v").collect().head
    val est = r2.getAs[Long]("est_distinct")
    assert(est > 3000 && est < 7000, s"estimate $est implausible for 5000")
    // registers are max-aggregated: duplicates never move them
    val dup = big.unionAll(big).unionAll(big)
    assert(Sketch.hllDistinct(dup, "v").collect().head
      .getAs[Long]("est_distinct") == est)
    // harmonic-sum invariant: S accounts for all 64 registers exactly
    assert(r2.getAs[Long]("s_sum") > 0L &&
      r2.getAs[Long]("s_sum") <= 64L * 134217728L)
  }

  test("histogram quantiles: exact rule correct, bucket floor never above") {
    val s = spark
    import s.implicits._
    val vals = (1 to 100).map(_.toLong).toDF("x")
    val rows = Sketch.histQuantiles(vals, "x", Seq(50, 90, 99))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(50L, 90L, 99L))
    rows.foreach { case (q, n, target, est, exact) =>
      assert(n == 100L && target == q) // target = ceil(q*100/100) = q
      assert(exact == q)               // values are exactly 1..100
      assert(est <= exact, s"bucket floor $est above exact $exact at q=$q")
      assert(est >= exact / 2, s"bucket floor $est implausibly low at q=$q")
    }
  }

  test("AMS F2: unbiased-family estimate lands near the exact self-join size") {
    val s = spark
    import s.implicits._
    // skewed weights: F2 dominated by the heavy value
    val w = (Seq(("hot", 100L)) ++ (1 to 50).map(i => (s"c$i", 2L))).toDF("v", "w")
    val r = Sketch.amsF2(w, "v", "w").collect().head
    val exact = r.getAs[Long]("exact_f2")
    assert(exact == 100L * 100L + 50L * 4L)
    val est = r.getAs[Long]("est_f2")
    // k=64 gives stderr ~ sqrt(2/64) ≈ 18% of F2; allow a wide determinism band
    assert(est > exact / 3 && est < exact * 3, s"est $est vs exact $exact")
    // doubling every weight exactly quadruples both estimate and exact
    val w2 = w.select(col("v"), (col("w") * 2).as("w"))
    val r2 = Sketch.amsF2(w2, "v", "w").collect().head
    assert(r2.getAs[Long]("exact_f2") == 4L * exact)
    // counters double exactly; the floor-div by k re-rounds: 4·est + [0,3]
    val est2 = r2.getAs[Long]("est_f2")
    assert(est2 >= 4L * est && est2 <= 4L * est + 3L)
  }

  test("CMS: estimates never below true counts; exact when uncontended") {
    val s = spark
    import s.implicits._
    // 200 occurrences of "hot", 1 each of 50 cold values
    val vals = (Seq.fill(200)("hot") ++ (1 to 50).map(i => s"cold_$i")).toDF("v")
    val cells = Sketch.cmsCells(vals, "v")
    // total mass per row r equals the input size (cells partition each row)
    val rowMass = cells.groupBy("r").agg(sum("cnt").as("m")).collect()
    assert(rowMass.length == 4 && rowMass.forall(_.getAs[Long]("m") == 250L))
    val probes = vals.groupBy(col("v").as("p")).agg(count(lit(1)).cast("long").as("truth"))
    val est = Sketch.cmsEstimate(cells, probes, "p").collect()
    est.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("truth"),
        s"CMS under-counted ${r.getAs[String]("p")}")
    }
    // the heavy hitter dominates its cells: estimate is exact or near-exact
    val hot = est.find(_.getAs[String]("p") == "hot").get
    assert(hot.getAs[Long]("est") >= 200L && hot.getAs[Long]("est") <= 260L)
    // absent probe estimates only collision mass
    val ghost = Sketch.cmsEstimate(cells, Seq("never_seen").toDF("p"), "p")
      .collect().head.getAs[Long]("est")
    assert(ghost >= 0L && ghost < 250L)
  }
}

class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {
  import graft.ops.BpeTrainer

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("greedy left-to-right merge: overlap, repeats, created-symbol guard") {
    def m(s: String, a: String, b: String) =
      BpeTrainer.mergeGreedy(s.split(" ").toIndexedSeq, a, b).mkString(" ")
    assert(m("a b c", "a", "b") == "ab c")
    // overlapping run merges leftmost-first, never chains
    assert(m("a a a", "a", "a") == "aa a")
    assert(m("a a a a", "a", "a") == "aa aa")
    // a symbol created this round (ab) cannot immediately re-merge as left
    assert(m("a b b", "a", "b") == "ab b")
    // but a PRE-EXISTING symbol equal to the merge result can
    assert(m("ab c", "ab", "c") == "abc")
    assert(m("x y", "a", "b") == "x y")
  }

  test("learn() replays classic BPE on a toy corpus") {
    val s = spark
    import s.implicits._
    // "lower" x2, "low" x5: first merge must be (l,o) cnt 7, then (lo,w) 7
    val words = Seq(("low", 5L), ("lower", 2L)).toDF("word", "cnt")
    val merges = BpeTrainer.learn(words, "word", "cnt", 3)
    assert(merges.map(t => (t._2, t._3, t._5)) ==
      Seq(("l", "o", 7L), ("lo", "w", 7L), ("e", "r", 2L)))
    // merged symbol strings compose
    assert(merges(1)._4 == "low")
  }

  test("learn() stops early when no pairs remain") {
    val s = spark
    import s.implicits._
    val words = Seq(("ab", 1L)).toDF("word", "cnt")
    // 1 word of 2 chars: one merge possible, then single symbols remain
    val merges = BpeTrainer.learn(words, "word", "cnt", 5)
    assert(merges.map(_._4) == Seq("ab"))
  }
}

class MediaDecodeSpec extends AnyFunSuite {
  import graft.ops.Multimodal._

  test("BMP roundtrip: every synthetic file decodes to the formula pixels") {
    (0L until 128L).foreach { id =>
      val img = decodeBmp(syntheticBmp(id)).get
      assert(img.width == 1 + (id % 16).toInt && img.height == 1 + ((id * 7) % 16).toInt)
      (0 until img.height).foreach { y =>
        (0 until img.width).foreach { x =>
          val p = img.pixels(y * img.width + x)
          assert(((p >> 16) & 0xff) == ((id + 7 * x + 13 * y) % 256).toInt, s"R id=$id ($x,$y)")
          assert(((p >> 8) & 0xff) == ((3 * id + 5 * x + y) % 256).toInt, s"G id=$id ($x,$y)")
          assert((p & 0xff) == ((x.toLong * y + id) % 256).toInt, s"B id=$id ($x,$y)")
        }
      }
    }
  }

  test("BMP top-down (negative height) decodes to the same image") {
    val up = syntheticBmp(5L)
    val img = decodeBmp(up).get
    // rewrite height as negative and reverse the stored row order
    val w = img.width; val h = img.height
    val rowBytes = (w * 3 + 3) & ~3
    val down = up.clone()
    val bb = java.nio.ByteBuffer.wrap(down).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -h)
    (0 until h).foreach { r =>
      System.arraycopy(up, 54 + (h - 1 - r) * rowBytes, down, 54 + r * rowBytes, rowBytes)
    }
    val img2 = decodeBmp(down).get
    assert(img2.width == w && img2.height == h)
    assert(img2.pixels.toSeq == img.pixels.toSeq)
  }

  test("BMP rejects unsupported flavors and truncation instead of guessing") {
    val ok = syntheticBmp(3L)
    (0 until 54).foreach(cut => assert(decodeBmp(java.util.Arrays.copyOf(ok, cut)).isEmpty))
    // truncated pixel data
    assert(decodeBmp(java.util.Arrays.copyOf(ok, ok.length - 1)).isEmpty)
    // 32bpp flag
    val bad = ok.clone(); bad(28) = 32.toByte
    assert(decodeBmp(bad).isEmpty)
    // RLE compression flag
    val rle = ok.clone(); rle(30) = 1.toByte
    assert(decodeBmp(rle).isEmpty)
    assert(decodeBmp("BMnotreally".getBytes).isEmpty)
  }

  test("PNG roundtrip: every synthetic file decodes to the formula pixels") {
    (0L until 128L).foreach { id =>
      val img = decodePng(syntheticPng(id)).get
      assert(img.width == 1 + (id % 16).toInt && img.height == 1 + ((id * 7) % 16).toInt)
      (0 until img.height).foreach { y =>
        (0 until img.width).foreach { x =>
          val p = img.pixels(y * img.width + x)
          assert(((p >> 16) & 0xff) == ((2 * id + 11 * x + 3 * y) % 256).toInt, s"R id=$id ($x,$y)")
          assert(((p >> 8) & 0xff) == ((5 * id + x.toLong * y + 2 * y) % 256).toInt, s"G id=$id ($x,$y)")
          assert((p & 0xff) == ((7 * id + 4 * x + 5 * y) % 256).toInt, s"B id=$id ($x,$y)")
        }
      }
    }
    // the generator cycles filter types by row, so ids with h >= 5 have
    // exercised ALL FIVE standard filters in the assertions above
    assert((0L until 128L).exists(id => 1 + ((id * 7) % 16) >= 5))
  }

  test("PNG gray and RGBA color types decode (alpha dropped)") {
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(typ.getBytes).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(bb.array(), 4, 4 + data.length)
      bb.putInt(crc.getValue.toInt).array()
    }
    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(); d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val t = new Array[Byte](512)
      while (!d.finished()) out.write(t, 0, d.deflate(t))
      d.end(); out.toByteArray
    }
    def png(w: Int, h: Int, colorType: Int, rows: Array[Byte]): Array[Byte] = {
      val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
        .put(8.toByte).put(colorType.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).array()
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
        chunk("IHDR", ihdr) ++ chunk("IDAT", deflate(rows)) ++
        chunk("IEND", Array.empty)
    }
    // 2x2 gray, filter 0: values 10, 20 / 30, 40
    val gray = png(2, 2, 0, Array[Byte](0, 10, 20, 0, 30, 40))
    assert(decodePng(gray).get.pixels.toSeq ==
      Seq(0x0a0a0a, 0x141414, 0x1e1e1e, 0x282828))
    // 1x1 RGBA, filter 0: (1, 2, 3, alpha 200) -> alpha dropped
    val rgba = png(1, 1, 6, Array[Byte](0, 1, 2, 3, 200.toByte))
    assert(decodePng(rgba).get.pixels.toSeq == Seq(0x010203))
    // 16-bit depth rejected
    val deep = png(1, 1, 0, Array[Byte](0, 1, 2))
    deep(24) = 16.toByte // bitDepth inside IHDR -> CRC now wrong too
    assert(decodePng(deep).isEmpty)
  }

  test("JPEG roundtrip: entropy decode + IDCT land on the closed-form pixels") {
    // the oracle restated in Scala: 4-term fixed-point IDCT + libjpeg
    // color constants, arithmetic shifts (floor) throughout
    val bt = JpegCos
    def cl(v: Int) = math.max(0, math.min(255, v))
    def valc(id: Long, w: Int, c: Int, x: Int, y: Int): Int = {
      val b = (y / 8) * (w / 8) + (x / 8) // row-major block index
      val lx = x % 8; val ly = y % 8
      val dcq = ((id * (3 + c) + 5 * b + c) % 128 - 64) * 8
      val a1q = ((id + 5 * c + 3 * b) % 15 - 7) * 16
      val a2q = ((5 * id + 3 * c + b) % 13 - 6) * 16
      val a5q = ((3 * id + 7 * c + 11 * b) % 11 - 5) * 16
      val acc = bt(0)(0).toLong * bt(0)(0) * dcq +
        bt(0)(0) * (bt(lx)(1).toLong * a1q + bt(lx)(2).toLong * a5q + bt(ly)(1).toLong * a2q)
      cl((((acc + (1L << 25)) >> 26) + 128).toInt)
    }
    (0L until 256L).foreach { id =>
      val img = decodeJpeg(syntheticJpeg(id)).get
      val (w, h) = (8 + 8 * (id % 2).toInt, 8 + 8 * ((id / 2) % 2).toInt)
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val yv = valc(id, w, 0, x, y); val cb = valc(id, w, 1, x, y); val cr = valc(id, w, 2, x, y)
        val r = cl(yv + ((91881 * (cr - 128) + 32768) >> 16))
        val g = cl(yv - ((22554 * (cb - 128) + 46802 * (cr - 128) + 32768) >> 16))
        val b = cl(yv + ((116130 * (cb - 128) + 32768) >> 16))
        val p = img.pixels(y * img.width + x)
        assert(p == ((r << 16) | (g << 8) | b),
          s"id=$id ($x,$y): got ${p.toHexString} want ${((r << 16) | (g << 8) | b).toHexString}")
      }
    }
  }

  test("JPEG multi-MCU grayscale: DC prediction chains across blocks") {
    // hand-built 8x16 (two vertical MCUs), DC-only blocks: each decodes to
    // a flat block value clamp(((2896^2 * dc*q + 2^25) >> 26) + 128); the
    // second block's DC arrives as a PREDICTED diff
    val dcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    val dcVals = (0 to 11).toArray
    val codes = { // canonical (code,len) per value
      val m = scala.collection.mutable.Map.empty[Int, (Int, Int)]
      var code = 0; var k = 0
      for (l <- 1 to 16) {
        for (_ <- 0 until dcBits(l - 1)) { m(dcVals(k)) = (code, l); code += 1; k += 1 }
        code <<= 1
      }
      m
    }
    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, body: Array[Int]): Unit = {
      out.write(0xff); out.write(marker)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff); body.foreach(out.write)
    }
    out.write(0xff); out.write(0xd8)
    seg(0xdb, 0 +: Array.fill(64)(8)) // flat q=8
    seg(0xc0, Array(8, 0, 16, 0, 8, 1, 1, 0x11, 0)) // h=16 w=8 gray
    seg(0xc4, 0x00 +: (dcBits ++ dcVals))
    // DC-only blocks still need an AC EOB code; define AC table 0 with the
    // same (BITS, VALS) layout so value 0x00 (EOB) is a valid short code
    seg(0xc4, 0x10 +: (dcBits ++ dcVals))
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0))
    var acc = 0; var n = 0
    val bytes = scala.collection.mutable.ArrayBuffer.empty[Int]
    def put(code: Int, len: Int): Unit = (len - 1 to 0 by -1).foreach { i =>
      acc = (acc << 1) | ((code >> i) & 1); n += 1
      if (n == 8) { bytes += acc; if (acc == 0xff) bytes += 0; acc = 0; n = 0 }
    }
    def size(v: Int) = { var s = 0; var a = math.abs(v); while (a > 0) { s += 1; a >>= 1 }; s }
    def putCoef(diff: Int): Unit = {
      val s = size(diff)
      val (c, l) = codes(s); put(c, l)
      if (s > 0) put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
    }
    val dc1 = 25; val dc2 = -12
    val (e1, l1) = codes(0) // EOB in the cloned AC table
    putCoef(dc1); put(e1, l1)
    putCoef(dc2 - dc1); put(e1, l1)
    if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
    bytes.foreach(out.write)
    out.write(0xff); out.write(0xd9)
    val img = decodeJpeg(out.toByteArray).get
    assert(img.width == 8 && img.height == 16)
    def flat(dc: Int) = {
      val accv = JpegCos(0)(0).toLong * JpegCos(0)(0) * dc * 8
      math.max(0, math.min(255, (((accv + (1L << 25)) >> 26) + 128).toInt))
    }
    val g1 = flat(dc1); val g2 = flat(dc2)
    (0 until 8).foreach(y => (0 until 8).foreach { x =>
      assert(img.pixels(y * 8 + x) == ((g1 << 16) | (g1 << 8) | g1), s"b1 ($x,$y)")
      assert(img.pixels((y + 8) * 8 + x) == ((g2 << 16) | (g2 << 8) | g2), s"b2 ($x,$y)")
    })
  }

  test("JPEG restart markers: byte-realign + DC predictor reset between MCUs") {
    // same two-MCU grayscale shape as the DC-prediction test, but with
    // DRI interval 1 and an RST0 marker between the MCUs: the second
    // block's DC is coded ABSOLUTE (predictor reset), and the scan is
    // padded to a byte boundary before the marker
    val dcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    val dcVals = (0 to 11).toArray
    val codes = {
      val m = scala.collection.mutable.Map.empty[Int, (Int, Int)]
      var code = 0; var k = 0
      for (l <- 1 to 16) {
        for (_ <- 0 until dcBits(l - 1)) { m(dcVals(k)) = (code, l); code += 1; k += 1 }
        code <<= 1
      }
      m
    }
    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, body: Array[Int]): Unit = {
      out.write(0xff); out.write(marker)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff); body.foreach(out.write)
    }
    out.write(0xff); out.write(0xd8)
    seg(0xdb, 0 +: Array.fill(64)(8))
    seg(0xc0, Array(8, 0, 16, 0, 8, 1, 1, 0x11, 0))
    seg(0xc4, 0x00 +: (dcBits ++ dcVals))
    seg(0xc4, 0x10 +: (dcBits ++ dcVals))
    seg(0xdd, Array(0, 1)) // DRI: restart interval 1
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0))
    var acc = 0; var n = 0
    val bytes = scala.collection.mutable.ArrayBuffer.empty[Int]
    def put(code: Int, len: Int): Unit = (len - 1 to 0 by -1).foreach { i =>
      acc = (acc << 1) | ((code >> i) & 1); n += 1
      if (n == 8) { bytes += acc; if (acc == 0xff) bytes += 0; acc = 0; n = 0 }
    }
    def pad(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
    def size(v: Int) = { var s = 0; var a = math.abs(v); while (a > 0) { s += 1; a >>= 1 }; s }
    def putCoef(v: Int): Unit = {
      val sz = size(v)
      val (c, l) = codes(sz); put(c, l)
      if (sz > 0) put(if (v >= 0) v else v + (1 << sz) - 1, sz)
    }
    val (e1, l1) = codes(0) // EOB
    val dc1 = 25; val dc2 = -12
    putCoef(dc1); put(e1, l1)
    pad(); bytes += 0xff; bytes += 0xd0 // RST0 at the interval boundary
    putCoef(dc2) // ABSOLUTE: predictor was reset by the marker
    put(e1, l1)
    pad()
    bytes.foreach(out.write)
    out.write(0xff); out.write(0xd9)
    val img = decodeJpeg(out.toByteArray).get
    def flat(dc: Int) = {
      val accv = JpegCos(0)(0).toLong * JpegCos(0)(0) * dc * 8
      math.max(0, math.min(255, (((accv + (1L << 25)) >> 26) + 128).toInt))
    }
    val g1 = flat(dc1); val g2 = flat(dc2)
    assert(img.pixels(0) == ((g1 << 16) | (g1 << 8) | g1))
    assert(img.pixels(8 * 8) == ((g2 << 16) | (g2 << 8) | g2),
      "RST must reset the DC predictor (block 2 decodes its absolute DC)")
    assert(img.pixels.take(64).distinct.size == 1 &&
      img.pixels.drop(64).distinct.size == 1)
  }

  test("JPEG tolerates fill bytes and TEM markers between segments") {
    // T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes; TEM
    // (FF01) is a standalone marker with no length field. Splice both
    // after the SOI of a synthetic file — pixels must be identical.
    val ok = syntheticJpeg(11L)
    val spliced = (ok.take(2) :+ 0xff.toByte :+ 0xff.toByte :+
      0xff.toByte :+ 0x01.toByte) ++ ok.drop(2)
    val a = decodeJpeg(ok).get
    val b = decodeJpeg(spliced).get
    assert(b.width == a.width && b.height == a.height)
    assert(b.pixels.toSeq == a.pixels.toSeq)
  }

  test("JPEG rejects truncation and out-of-scope shapes instead of guessing") {
    val ok = syntheticJpeg(7L)
    Seq(1, 2, 10, 40, ok.length / 2, ok.length - 3).foreach { cut =>
      assert(decodeJpeg(java.util.Arrays.copyOf(ok, cut)).isEmpty, s"cut=$cut")
    }
    // progressive (SOF2) rejected
    val prog = ok.clone()
    val sof = { var i = 2; while (!((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0)) i += 1; i }
    prog(sof + 1) = 0xc2.toByte
    assert(decodeJpeg(prog).isEmpty)
    // 2x1 subsampling rejected (scope: 4:4:4 only)
    val sub = ok.clone()
    sub(sof + 2 + 5 + 2) = 0x21.toByte // first component sampling byte
    assert(decodeJpeg(sub).isEmpty)
    assert(decodeJpeg("not a jpeg".getBytes).isEmpty)
    // sniffHeader agrees on the real file (id 7 -> 16x16)
    assert(sniffHeader(ok) == SniffResult("jpeg", 16, 16))
  }

  test("PNG rejects corruption instead of guessing") {
    val ok = syntheticPng(9L)
    // flip one IDAT payload byte: chunk CRC must catch it
    val bad = ok.clone(); bad(45) = (bad(45) ^ 0x5a).toByte
    assert(decodePng(bad).isEmpty)
    // truncation at every chunk boundary region
    Seq(7, 20, 40, ok.length - 5).foreach { cut =>
      assert(decodePng(java.util.Arrays.copyOf(ok, cut)).isEmpty, s"cut=$cut")
    }
    assert(decodePng("not a png at all".getBytes).isEmpty)
  }

  test("WAV roundtrip: rate/channels/samples match the formulas") {
    (0L until 128L).foreach { id =>
      val pcm = decodeWavPcm(syntheticWav(id)).get
      assert(pcm.sampleRate == 8000 * (1 + id % 4).toInt && pcm.channels == (1 + id % 2).toInt)
      val n = (64 + id % 64).toInt
      assert(pcm.samples.length == n)
      (0 until n).foreach { i =>
        assert(pcm.samples(i) == ((id * 31 + i * 17) % 4001 - 2000).toInt, s"id=$id i=$i")
      }
    }
  }

  test("WAV rejects float/8-bit/compressed and survives hostile chunk sizes") {
    val ok = syntheticWav(2L)
    val float = ok.clone(); float(20) = 3.toByte // fmt code 3 = IEEE float
    assert(decodeWavPcm(float).isEmpty)
    val eight = ok.clone(); eight(34) = 8.toByte
    assert(decodeWavPcm(eight).isEmpty)
    (0 until 44).foreach(cut => assert(decodeWavPcm(java.util.Arrays.copyOf(ok, cut)).isEmpty))
    // declared data size beyond the file: decoder clamps to actual bytes
    val liar = ok.clone()
    java.nio.ByteBuffer.wrap(liar).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, Int.MaxValue)
    val clamped = decodeWavPcm(liar)
    assert(clamped.exists(_.samples.length == (ok.length - 44) / 2))
  }

  test("thumbnail: 1x1 image broadcasts; identity grid samples exactly") {
    val one = Image(1, 1, Array(0xff0000))
    assert(thumbnailGray(one, 4, 4).toSeq == Seq.fill(16)(299 * 255 / 1000))
    val four = Image(4, 4, Array.tabulate(16)(i => i << 16)) // R = index
    assert(thumbnailGray(four, 4, 4).toSeq == (0 until 16).map(i => 299 * i / 1000))
  }
}
