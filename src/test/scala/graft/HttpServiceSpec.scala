package graft

import graft.corpus.CorpusGen
import graft.index.IndexBuilder
import graft.query.{HttpService, LocalService, Searcher}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The HTTP serving endpoint: parity with direct LocalService calls,
  * correctness under 16 concurrent socket clients, and input validation. */
class HttpServiceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val tmp = java.nio.file.Files.createTempDirectory("graft_http").toString
  private lazy val svc = {
    val corpus = CorpusGen.generate(spark, 500L, seed = 7L, partitions = 4)
    IndexBuilder.build(spark, corpus, tmp, partitions = 4)
    new LocalService(Searcher.load(spark, tmp))
  }
  private lazy val http = new HttpService(svc, port = 0, nThreads = 16)

  override def afterAll(): Unit = {
    http.stop()
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  private def get(path: String): (Int, String) = {
    val url = java.net.URI.create(s"http://127.0.0.1:${http.boundPort}$path").toURL
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(30000)
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(is.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    is.close()
    (code, body)
  }

  private val HitRe = """\{"doc":(\d+),"score":([0-9.Ee+-]+)\}""".r
  private def parseHits(body: String): Seq[(Int, Double)] =
    HitRe.findAllMatchIn(body).map(m => (m.group(1).toInt, m.group(2).toDouble)).toSeq

  test("GET /search is bit-identical to a direct LocalService call") {
    val direct = svc.search(Seq("if", "return"), 10)
    assume(direct.nonEmpty, "probe terms must hit the synthetic corpus")
    val (code, body) = get("/search?q=if+return&k=10")
    assert(code == 200)
    assert(parseHits(body) == direct.map(h => (h.docId, h.score)))
  }

  test("phrase, NOT and slop parameters round-trip") {
    val q = Seq("if", "return")
    assert(parseHits(get("/search?q=if+return&k=5&phrase=1")._2)
      == svc.search(q, 5, phrase = true).map(h => (h.docId, h.score)))
    assert(parseHits(get("/search?q=if+return&k=5&not=while")._2)
      == svc.search(q, 5, excludeTerms = Seq("while")).map(h => (h.docId, h.score)))
    assert(parseHits(get("/search?q=if+return&k=5&phrase=1&slop=2")._2)
      == svc.search(q, 5, phrase = true, slop = 2).map(h => (h.docId, h.score)))
  }

  test("16 concurrent socket clients stay rank- and score-identical") {
    val queries = Vector("if", "return", "if return", "while", "for int",
      "static void", "class", "public static")
    val expect = queries.map(q => q ->
      svc.search(q.split(' ').toSeq, 10).map(h => (h.docId, h.score))).toMap
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    try {
      val futures = (0 until 64).map { i =>
        val q = queries(i % queries.length)
        pool.submit(new java.util.concurrent.Callable[(String, Seq[(Int, Double)])] {
          def call() = q -> parseHits(
            get(s"/search?q=${q.replace(' ', '+')}&k=10")._2)
        })
      }
      futures.foreach { f =>
        val (q, got) = f.get(60, java.util.concurrent.TimeUnit.SECONDS)
        assert(got == expect(q), s"divergence under concurrency for '$q'")
      }
    } finally pool.shutdownNow()
  }

  test("GET /stream: incremental NDJSON frames, final set identical to /search") {
    val direct = svc.search(Seq("if", "return"), 12)
    assume(direct.size == 12, "need a deep ranking for multi-page streaming")
    val url = java.net.URI.create(
      s"http://127.0.0.1:${http.boundPort}/stream?q=if+return&k=12&page=5").toURL
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(30000)
    assert(conn.getResponseCode == 200)
    assert(conn.getHeaderField("Transfer-Encoding") == "chunked",
      "streaming endpoint must use chunked transfer")
    val rd = new java.io.BufferedReader(
      new java.io.InputStreamReader(conn.getInputStream,
        java.nio.charset.StandardCharsets.UTF_8))
    val lines = Iterator.continually(rd.readLine()).takeWhile(_ != null).toVector
    rd.close()
    // every line is a standalone frame: k hit frames + one done frame
    assert(lines.size == 13, lines.mkString("|"))
    val FrameRe = """\{"rank":(\d+),"doc":(\d+),"score":([0-9.Ee+-]+)\}""".r
    val hits = lines.init.map {
      case FrameRe(r, d, s) => (r.toInt, d.toInt, s.toDouble)
      case other            => fail(s"bad frame: $other")
    }
    assert(lines.last == """{"done":true,"n":12}""")
    assert(hits.map(_._1) == (1 to 12)) // global ranks across page boundaries
    // the streamed union equals one /search call — cursor pages are exact
    assert(hits.map(h => (h._2, h._3)) == direct.map(h => (h.docId, h.score)))
    // a short ranking terminates with fewer frames and the true count
    val (_, small) = get("/stream?q=if+return&k=100000&page=1000")
    val n = """\{"done":true,"n":(\d+)\}""".r.findFirstMatchIn(small).get.group(1).toInt
    assert(n == svc.search(Seq("if", "return"), 100000).size)
    // validation still 400s before any frame
    assert(get("/stream")._1 == 400)
  }

  test("analyze=text runs the query through the text analyzer chain") {
    // "returning" stems to "return" — matches the raw code-index term
    val want = parseHits(get("/search?q=return&k=5")._2)
    assume(want.nonEmpty)
    assert(parseHits(get("/search?q=returning&analyze=text&k=5")._2) == want)
    // a query the analyzer consumes entirely (stopwords) returns empty,
    // not a 400 — on both endpoints
    val (c, b) = get("/search?q=the+a&analyze=text")
    assert(c == 200 && b == """{"hits":[]}""")
    val (cs, bs) = get("/stream?q=the+a&analyze=text")
    assert(cs == 200 && bs.trim == """{"done":true,"n":0}""")
  }

  test("input validation: 400 with a JSON error, never a hang or a 500") {
    assert(get("/search")._1 == 400)
    assert(get("/search?q=")._1 == 400)
    val (c, b) = get("/search?q=if&k=notanumber")
    assert(c == 400 && b.contains("\"error\""))
    assert(get("/explain?q=if")._1 == 400) // missing doc
    assert(get("/suggest")._1 == 400) // missing t
  }

  test("explain, suggest and stats endpoints serve coherent JSON") {
    val hits = svc.search(Seq("if"), 1)
    assume(hits.nonEmpty)
    val (c1, b1) = get(s"/explain?q=if&doc=${hits.head.docId}")
    assert(c1 == 200 && b1.contains("\"contribution\""))
    // explain contributions must sum to the served score
    val contrib = """"contribution":([0-9.Ee+-]+)""".r
      .findAllMatchIn(b1).map(_.group(1).toDouble).sum
    assert(math.abs(contrib - hits.head.score) < 1e-9)
    val (c2, b2) = get("/suggest?t=retur")
    assert(c2 == 200 && b2.contains("\"suggestions\""))
    val (c3, b3) = get("/stats")
    assert(c3 == 200 && b3.contains("\"cache_hits\""))
  }
}
