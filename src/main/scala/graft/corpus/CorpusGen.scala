package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic source-code corpus (BASELINE.json `input_hint`):
  * rows (repo, path, commit, lang, content). Every column is a pure function
  * of (seed, id), so generation is embarrassingly parallel and identical at
  * any parallelism — the scale-out story for 10^12 files is `spark.range(n)`
  * with no shuffle at all.
  *
  * Content is templated code whose identifiers are drawn from a Zipf-skewed
  * vocabulary, so language keywords (`if`, `return`, `int`, ...) are hot
  * terms with df ≈ corpus size — exercising the hot-term salting path — plus
  * per-file unique identifiers (df = 1) exercising the rare-term path.
  */
object CorpusGen {

  val Langs: Array[String] = Array("scala", "c", "py", "java")
  val Ext: Map[String, String] = Map("scala" -> "scala", "c" -> "c", "py" -> "py", "java" -> "java")

  /** Zipf-ish vocabulary: earlier entries are exponentially hotter. */
  val Vocab: Array[String] = Array(
    "if", "return", "int", "val", "def", "else", "for", "while", "var",
    "new", "null", "true", "false", "len", "size", "get", "set", "map",
    "list", "str", "add", "key", "value", "index", "count", "node", "next",
    "data", "result", "tmp", "buf", "ptr", "item", "iter", "sum", "acc",
    "ctx", "cfg", "arg", "args", "name", "id", "type", "kind", "state",
    "flag", "mask", "bits", "hash", "seed", "left", "right", "head", "tail",
    "root", "child", "parent", "depth", "width", "height", "score", "rank",
    "query", "term", "doc", "posting", "block", "span", "offset", "pos",
    "freq", "weight", "norm", "alpha", "beta", "gamma", "delta", "epsilon")

  // splitmix64 — stable, public-domain mixing constants
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic PRNG stream for one doc. */
  private final class Rng(seed: Long, id: Long) {
    private var s = mix64(seed * 0x632be59bd9b4e019L ^ id)
    def nextLong(): Long = { s = mix64(s); s }
    def nextInt(bound: Int): Int = {
      val v = (nextLong() >>> 1) % bound
      v.toInt
    }
    def nextDouble(): Double = (nextLong() >>> 11).toDouble / (1L << 53).toDouble
  }

  /** Zipf(s≈1.1)-distributed index into Vocab via inverse-CDF sampling of a
    * precomputed table (deterministic; no external libs). */
  private lazy val zipfCdf: Array[Double] = {
    val s = 1.1
    val w = Vocab.indices.map(i => 1.0 / math.pow(i + 1.0, s)).toArray
    val total = w.sum
    val cdf = new Array[Double](w.length)
    var acc = 0.0
    var i = 0
    while (i < w.length) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf
  }

  private def zipfWord(r: Rng): String = {
    val u = r.nextDouble()
    var i = java.util.Arrays.binarySearch(zipfCdf, u)
    if (i < 0) i = -i - 1
    Vocab(math.min(i, Vocab.length - 1))
  }

  val NRepos = 64

  /** Pure row generator. */
  def row(seed: Long, id: Long): (String, String, String, String, String) = {
    val r = new Rng(seed, id)
    val repo = f"repo${(id % NRepos)}%03d"
    val lang = Langs((id % Langs.length).toInt)
    val path = f"src/f${id}%08d.${Ext(lang)}"
    val commit = graft.core.Sha256.hex(s"$repo/$path@$seed").substring(0, 40)
    val nFns = 1 + r.nextInt(3)
    val sb = new StringBuilder
    var f = 0
    while (f < nFns) {
      val fname = s"fn_${id}_$f" // unique rare token (df=1)
      val nStmts = 3 + r.nextInt(10)
      lang match {
        case "py"    => sb.append(s"def $fname(${zipfWord(r)}, ${zipfWord(r)}):\n")
        case "c"     => sb.append(s"int $fname(int ${zipfWord(r)}, int ${zipfWord(r)}) {\n")
        case "java"  => sb.append(s"static int $fname(int ${zipfWord(r)}, int ${zipfWord(r)}) {\n")
        case _       => sb.append(s"def $fname(${zipfWord(r)}: Int, ${zipfWord(r)}: Int): Int = {\n")
      }
      var st = 0
      while (st < nStmts) {
        r.nextInt(5) match {
          case 0 => sb.append(s"  if (${zipfWord(r)} > ${zipfWord(r)}) return ${zipfWord(r)};\n")
          case 1 => sb.append(s"  val ${zipfWord(r)} = ${zipfWord(r)} + ${zipfWord(r)};\n")
          case 2 => sb.append(s"  while (${zipfWord(r)} < ${zipfWord(r)}) ${zipfWord(r)} = ${zipfWord(r)} * ${zipfWord(r)};\n")
          case 3 => sb.append(s"  ${zipfWord(r)}.${zipfWord(r)}(${zipfWord(r)}, ${zipfWord(r)});\n")
          case _ => sb.append(s"  for (${zipfWord(r)} <- ${zipfWord(r)}) ${zipfWord(r)} += ${zipfWord(r)};\n")
        }
        st += 1
      }
      sb.append(s"  return ${zipfWord(r)};\n}\n")
      f += 1
    }
    (repo, path, commit, lang, sb.toString)
  }

  final case class SourceFile(repo: String, path: String, commit: String, lang: String, content: String)

  /** Distributed generation: `spark.range` → pure map; no shuffle. */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L,
               partitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions)
      .map { id => val (r, p, c, l, t) = row(seed, id); SourceFile(r, p, c, l, t) }
      .toDF()
      .withColumn("sha256", sha2(col("content"), 256))
  }
}
