package graft.tools
object Goldens {
  def main(args: Array[String]): Unit = {
    val words = Seq("table", "scan", "query", "spark", "value", "hash", "join",
      "fast", "slow", "window", "the", "a", "part", "stream", "batch", "dup")
    words.foreach { w =>
      val b = w.getBytes("UTF-8")
      println(s"""("$w", ${graft.index.Bloom.murmur2(b, 0x9747b28c)}L, ${graft.index.Bloom.murmur2(b, 0x5bd1e995)}L),""")
    }
  }
}
