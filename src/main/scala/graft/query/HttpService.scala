package graft.query

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.core.Oracle
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors

/** Socket-level serving endpoint over [[LocalService]] — the reference's
  * query server reimagined on pure-JDK HTTP (the reference serves over
  * async gRPC with N completion-queue threads and 16 sync bench clients,
  * `grpc_server_impl.h:209-331`, `qq_server.cc`; no RPC jars exist in this
  * environment, so the framing is JDK `com.sun.net.httpserver` — real
  * sockets, real concurrent clients, same thread-pool shape).
  *
  * Endpoints (all GET, JSON out):
  *  - `/search?q=a+b&k=10[&phrase=1][&not=c+d][&slop=2]` — BM25 top-k;
  *    `phrase=1` requires the terms adjacent in order; `not` excludes;
  *    `slop` relaxes phrase adjacency.
  *  - `/explain?q=a+b&doc=7` — per-term score decomposition for one doc.
  *  - `/suggest?t=trm` — dictionary spell suggestions.
  *  - `/stats` — cache hit/miss/eviction counters and resident postings.
  *
  * Concurrency: requests dispatch on a fixed pool; [[LocalService]] is
  * safe under concurrent `search` (striped/snapshot cache — the 16-client
  * parity test and `served_qps_16` bench exercise it), so the endpoint
  * adds no locking of its own. Scale story: one such server per index
  * replica behind any HTTP balancer; the index itself stays columnar in
  * the cluster and the service df-gates what it makes resident.
  */
final class HttpService(svc: LocalService, port: Int = 0, nThreads: Int = 16) {

  private val pool = Executors.newFixedThreadPool(nThreads)
  private val server: HttpServer = {
    // without TCP_NODELAY the JDK server's small responses hit the Nagle +
    // delayed-ACK interaction: ~40 ms floor per request (measured 44 ms
    // p50 on loopback, sub-ms after)
    System.setProperty("sun.net.httpserver.nodelay", "true")
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    s.setExecutor(pool)
    s.createContext("/search", (ex: HttpExchange) => handle(ex)(doSearch))
    s.createContext("/stream", (ex: HttpExchange) => doStream(ex))
    s.createContext("/explain", (ex: HttpExchange) => handle(ex)(doExplain))
    s.createContext("/suggest", (ex: HttpExchange) => handle(ex)(doSuggest))
    s.createContext("/stats", (ex: HttpExchange) => handle(ex)(_ => doStats()))
    s.start()
    s
  }

  /** Bound port (useful when constructed with port 0). */
  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = {
    server.stop(0)
    pool.shutdownNow()
  }

  // ---- request handling ----

  private def handle(ex: HttpExchange)(f: Map[String, String] => String): Unit = {
    val (code, body) =
      try (200, f(params(ex)))
      catch {
        case e: IllegalArgumentException => (400, jsonErr(e.getMessage))
        case e: Exception                => (500, jsonErr(e.toString))
      }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def params(ex: HttpExchange): Map[String, String] = {
    val raw = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    raw.split('&').iterator.filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      if (i < 0) kv -> ""
      else java.net.URLDecoder.decode(kv.substring(0, i), "UTF-8") ->
        java.net.URLDecoder.decode(kv.substring(i + 1), "UTF-8")
    }.toMap
  }

  private def terms(p: Map[String, String], key: String): Seq[String] =
    p.getOrElse(key, "").split("[ +]+").iterator.filter(_.nonEmpty).toSeq

  /** `analyze=text` runs the raw query (and its `not` terms) through the
    * TEXT analyzer chain (possessive → stopwords → Porter) — the terms a
    * `textAnalyzer`-built index expects. For PHRASE queries the analyzed
    * tokens' ORIGINAL positions ride along as per-slot shifts, so a
    * phrase whose interior words include stopwords matches across the
    * index's position gaps exactly like Lucene `match_phrase` (query-side
    * position increments). Raw terms pass through untouched otherwise. */
  private def analyzedWithShifts(p: Map[String, String],
                                 key: String): (Seq[String], Option[Seq[Int]]) = {
    val raw = terms(p, key)
    if (p.get("analyze").contains("text")) {
      // fold=1 (with analyze=text) runs the FULL folded chain the
      // textFold index expects: html_strip char filter first (on the raw
      // param — entities/tags must reach the stripper intact), then
      // asciifolding inside the analyzer. Without it an accented or
      // entity-bearing query can never match a folded index.
      val fold = p.get("fold").contains("1")
      val joined = raw.mkString(" ")
      val toks = graft.core.Tokenizer.tokenizeText(
        if (fold) graft.core.Tokenizer.stripHtml(joined) else joined, fold)
      (toks.map(_.term).toSeq, Some(toks.map(_.position).toSeq))
    } else (raw, None)
  }
  private def analyzed(p: Map[String, String], key: String): Seq[String] =
    analyzedWithShifts(p, key)._1
  private def queryTerms(p: Map[String, String]): Seq[String] = analyzed(p, "q")

  private def intOf(p: Map[String, String], key: String, dflt: Int): Int =
    p.get(key).map { v =>
      try v.toInt
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"$key must be an integer, got '$v'") }
    }.getOrElse(dflt)

  // ---- endpoints ----

  private def doSearch(p: Map[String, String]): String = {
    if (terms(p, "q").isEmpty)
      throw new IllegalArgumentException("missing query ?q=")
    val (q, shifts) = analyzedWithShifts(p, "q")
    if (q.isEmpty) return """{"hits":[]}""" // analyzer ate the whole query
    val phrase = p.get("phrase").contains("1")
    val slop = intOf(p, "slop", 0)
    val hits = svc.search(q,
      k = intOf(p, "k", 10),
      phrase = phrase,
      excludeTerms = analyzed(p, "not"),
      slop = slop,
      phraseShifts = if (phrase && slop == 0) shifts else None)
    hitsJson(hits)
  }

  /** Streaming results (`StreamingSearch` analog,
    * `grpc_server_impl.h:209-460`): chunked transfer, one NDJSON frame per
    * hit, flushed page by page. Pages advance through the search-after
    * cursor — page N+1 is COMPUTED only after page N's frames are already
    * on the wire, so a slow consumer (or an early hang-up) never pays for
    * results it hasn't asked to render; cursor pages are exact slices of
    * the global (score desc, docId asc) order (bitwise-deterministic
    * scores), so the streamed set is identical to one `/search?k=` call.
    * `/stream?q=a+b&k=50[&page=10][&phrase=1][&not=c][&slop=2]`. */
  private def doStream(ex: HttpExchange): Unit = {
    val os = ex.getResponseBody
    // Once the 200/chunked headers are on the wire a 400 is impossible —
    // sendResponseHeaders would throw IllegalStateException out of the
    // handler instead of closing the stream. Track it so a future require
    // added inside the paging loop degrades to a clean close, not a crash.
    var headersSent = false
    try {
      val p = params(ex)
      if (terms(p, "q").isEmpty)
        throw new IllegalArgumentException("missing query ?q=")
      val (q, shifts0) = analyzedWithShifts(p, "q")
      val k = if (q.isEmpty) 0 else intOf(p, "k", 10)
      val pageSize = math.max(1, intOf(p, "page", 10))
      val phrase = p.get("phrase").contains("1")
      val ex0 = analyzed(p, "not")
      val slop = intOf(p, "slop", 0)
      val shifts = if (phrase && slop == 0) shifts0 else None
      ex.getResponseHeaders.set("Content-Type", "application/x-ndjson")
      ex.sendResponseHeaders(200, 0) // length 0 = chunked transfer
      headersSent = true
      var sent = 0
      var cursor: Option[(Double, Int)] = None
      var more = true
      while (more && sent < k) {
        val want = math.min(pageSize, k - sent)
        val page = svc.search(q, want, phrase,
          excludeTerms = ex0, slop = slop, after = cursor,
          phraseShifts = shifts)
        page.foreach { h =>
          sent += 1
          os.write(
            (s"""{"rank":$sent,"doc":${h.docId},"score":${h.score}}""" + "\n")
              .getBytes(StandardCharsets.UTF_8))
        }
        os.flush() // frame boundary: this page is on the wire NOW
        more = page.size == want // a short page means the ranking is exhausted
        cursor = page.lastOption.map(h => (h.score, h.docId)).orElse(cursor)
      }
      os.write(s"""{"done":true,"n":$sent}""".getBytes(StandardCharsets.UTF_8))
      os.write('\n')
    } catch {
      case e: IllegalArgumentException if !headersSent =>
        val b = jsonErr(e.getMessage).getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(400, b.length)
        os.write(b)
      case _: IllegalArgumentException => // mid-stream: just close the body
      case _: java.io.IOException => // client hung up mid-stream: stop paging
    } finally os.close()
  }

  private def doExplain(p: Map[String, String]): String = {
    val q = terms(p, "q")
    if (q.isEmpty) throw new IllegalArgumentException("missing query ?q=")
    val doc = p.getOrElse("doc",
      throw new IllegalArgumentException("missing ?doc=")).toInt
    val rows = svc.explain(q, doc)
    rows.map { e =>
      s"""{"term":${jsonStr(e.term)},"tf":${e.tf},"df":${e.df},""" +
        s""""idf":${e.idf},"tfNorm":${e.tfNorm},"contribution":${e.contribution}}"""
    }.mkString("""{"doc":""" + doc + ""","terms":[""", ",", "]}")
  }

  private def doSuggest(p: Map[String, String]): String = {
    val t = p.getOrElse("t",
      throw new IllegalArgumentException("missing ?t="))
    svc.suggest(t).map { case (w, dist, df) =>
      s"""{"term":${jsonStr(w)},"dist":$dist,"df":$df}"""
    }.mkString("""{"suggestions":[""", ",", "]}")
  }

  private def doStats(): String = {
    val (hits, misses, evictions) = svc.cacheStats
    s"""{"cache_hits":$hits,"cache_misses":$misses,"cache_evictions":$evictions,""" +
      s""""resident_postings":${svc.residentPostings}}"""
  }

  // ---- JSON ----

  private def hitsJson(hits: Seq[Oracle.Hit]): String =
    hits.map(h => s"""{"doc":${h.docId},"score":${h.score}}""")
      .mkString("""{"hits":[""", ",", "]}")

  private def jsonErr(msg: String): String =
    s"""{"error":${jsonStr(if (msg == null) "request failed" else msg)}}"""

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
