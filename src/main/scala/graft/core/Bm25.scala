package graft.core

/** Elasticsearch-flavored BM25, matching the reference's live scoring path.
  *
  * Reference: `src/qq_mem/src/scoring.h`
  *  - idf  = ln(1 + (N - df + 0.5)/(df + 0.5))          (`scoring.h:21-25`)
  *  - tfNorm = tf*(k1+1)/(tf + k1*(1 - b + b*len/avg))  (`scoring.h:28-40`)
  *  - live path is the LOSSY variant (`scoring.h:124-145,148-160`): per-doc
  *    length is first crushed through the 1-byte code ([[LenByte]]) and the
  *    denominator term k1*(1-b+b*len/avg) is precomputed in a 256-entry
  *    cache keyed by the length byte (`scoring.h:85-96`).
  *
  * Golden values (from `tests_8.cc:65-122`, validated there against a real
  * Elasticsearch run): idf(1,1)=0.288, idf(3,1)=0.981,
  * tfnorm(1,3,3.0)=1.0, tfnorm(1,2,8/3)=1.11.
  */
object Bm25 {
  val K1 = 1.2
  val B = 0.75

  def idf(nDocs: Long, df: Long): Double =
    math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))

  def tfNorm(tf: Long, docLen: Long, avgLen: Double): Double =
    tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * docLen / avgLen))

  /** The 256-entry lossy denominator cache: cache(b) = k1*(1-b0+b0*lossyLen/avg). */
  def lossyCache(avgLen: Double): Array[Double] = {
    val cache = new Array[Double](256)
    var i = 0
    while (i < 256) {
      cache(i) = K1 * (1.0 - B + B * LenByte.decode(i) / avgLen)
      i += 1
    }
    cache
  }

  def tfNormLossy(tf: Long, lenByte: Int, cache: Array[Double]): Double =
    tf * (K1 + 1.0) / (tf + cache(lenByte & 0xff))

  /** Lossy tfNorm without a prebuilt cache (same arithmetic). */
  def tfNormLossy(tf: Long, lenByte: Int, avgLen: Double): Double =
    tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * LenByte.decode(lenByte) / avgLen))
}
