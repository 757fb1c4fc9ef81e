package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketches for corpus statistics at scale.
  *
  * The reference sizes per-term structures from exact df/cf counts
  * (`histogram.h`, engine stats); at 10^12 docs an exact distinct over a
  * high-cardinality column (the term dictionary, URL hosts, shingle space)
  * is a full shuffle of every distinct value. A KMV (k-minimum-values)
  * sketch answers "how many distinct values" from only the k smallest
  * hashes — one map-side partial aggregate plus a k-row driver merge
  * (TakeOrderedAndProject), no full-cardinality shuffle.
  *
  * Everything here is integer-exact and engine-portable by construction:
  * the hash is the first 8 hex chars of md5 read as a 32-bit integer, and
  * the estimator is integer arithmetic — `(k-1) * 2^32 div u_k` — so the
  * DuckDB oracle reproduces the estimate bit-for-bit (unlike HLL sketches,
  * whose register layouts are engine-private).
  */
object Sketch {

  /** 32-bit hash point for KMV: first 8 hex chars of md5, as BIGINT. */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** One-row KMV distinct-count estimate over `values(valueCol)`:
    * (k, u_k, est_distinct, exact_distinct).
    *
    * est = (k-1) · 2^32 div u_k where u_k is the k-th smallest distinct
    * 32-bit hash (the classic KMV estimator, floor-divided); when fewer
    * than k distinct hashes exist the sketch is exact and returns that
    * count. `exact_distinct` (a full distinct count of the raw values) is
    * included for self-auditing error — at true scale one would drop it
    * and keep only the sketch columns.
    *
    * Scale shape: distinct() partial-aggregates map-side; orderBy+limit(k)
    * plans as TakeOrderedAndProject (per-partition bounded heaps, k-row
    * driver merge) — the only full-width pass over the data is the scan. */
  def kmvDistinct(values: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    // one distinct shuffle over the raw values serves BOTH consumers (the
    // sketch and the self-audit exact count); the second distinct — over
    // the 32-bit hash points, to collapse hash collisions exactly like
    // the oracle — runs on longs and partial-aggregates to almost nothing
    val dv = values.select(col(valueCol)).distinct().cache()
    dv.count()
    val u = dv.select(hash32(col(valueCol)).as("u")).distinct()
    val mins = u.orderBy("u").limit(k)
    val kth = mins.agg(max("u").as("u_k"), count(lit(1)).as("n_min"))
    val exact = dv.agg(count(lit(1)).cast("long").as("exact_distinct"))
    val out = kth.crossJoin(exact).select(
      lit(k.toLong).as("k"),
      col("u_k").cast("long").as("u_k"),
      when(col("n_min") < k, col("n_min"))
        .otherwise(expr(s"${(k - 1).toLong} * 4294967296 div u_k"))
        .cast("long").as("est_distinct"),
      col("exact_distinct"))
    val rows = out.collect() // 1 row; materialize, then drop the cache
    dv.unpersist(false)
    values.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** α·m²·10⁶ for m = 64, pinned as an exact integer so both engines use
    * the identical constant: round(0.7213/(1 + 1.079/64) · 64² · 10⁶)
    * (the standard HLL bias constant, Flajolet et al. 2007). */
  val HllAlphaM2Micro: Long = 2905460551L

  /** One-row HyperLogLog distinct-count estimate (m = 64 registers, p = 6)
    * over `values(valueCol)`: (m, v_zero, s_sum, est_raw, est_distinct,
    * exact_distinct).
    *
    * Unlike engine-private HLL register layouts, every step here is pinned
    * and integer-exact so the DuckDB oracle replays it bit-for-bit:
    * h = first 8 md5 hex chars as a 32-bit value; register j = h >> 26;
    * sub-hash w = h & (2²⁶−1); rank = 27 − bit_length(w) (27 when w = 0);
    * M_j = max rank. The harmonic sum Σ 2^(−M_j) is carried as the exact
    * integer S = Σ 2^(27−M_j) (absent registers contribute 2²⁷), and the
    * raw estimate is α·m²·2²⁷ div S in integer arithmetic. The standard
    * small-range correction switches to linear counting
    * round(m·ln(m/V)) when est_raw ≤ 2.5m and V > 0 — the one
    * float step, same IEEE double ln both engines (the f5_idf precedent).
    *
    * Scale: the register table is a 64-row groupBy — one map-side partial
    * aggregate over the scan, mergeable across any partitioning (HLL's
    * whole point at 10^12 rows); no distinct shuffle at all, unlike KMV's
    * distinct() pass. */
  def hllDistinct(values: DataFrame, valueCol: String): DataFrame = {
    val h = hash32(col(valueCol))
    val regs = values
      .select(shiftright(h, 26).as("j"),
        h.bitwiseAND(lit(67108863L)).as("w"))
      .select(col("j"),
        when(col("w") === 0, lit(27))
          .otherwise(lit(27) - length(conv(col("w"), 10, 2))).as("rank"))
      .groupBy("j").agg(max("rank").as("m_j"))
    val agg = regs.agg(
      (sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(27 - m_j AS INT))")) +
        (lit(64L) - count(lit(1))) * lit(134217728L)).cast("long").as("s_sum"),
      (lit(64L) - count(lit(1))).cast("long").as("v_zero"))
    val exact = values.select(col(valueCol)).distinct()
      .agg(count(lit(1)).cast("long").as("exact_distinct"))
    val out = agg.crossJoin(exact).select(
      lit(64L).as("m"), col("v_zero"), col("s_sum"),
      expr(s"$HllAlphaM2Micro * 134217728 div s_sum div 1000000")
        .cast("long").as("est_raw"),
      col("exact_distinct"))
      .withColumn("est_distinct",
        when(col("est_raw") <= 160 && col("v_zero") > 0,
          round(lit(64.0) * log(lit(64.0) / col("v_zero"))).cast("long"))
          .otherwise(col("est_raw")))
      .select(col("m"), col("v_zero"), col("s_sum"), col("est_raw"),
        col("est_distinct"), col("exact_distinct"))
    val rows = out.collect()
    values.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** Count-min sketch cells over `values(valueCol)`: (r, b, cnt) for
    * `depth` hash rows × `width` buckets. Row-r bucket of v is the pinned
    * md5 hash of "r|v" mod width — engine-portable like every sketch here.
    *
    * Scale: one explode (×depth) + a groupBy onto depth·width cells —
    * map-side partial aggregation collapses each partition to ≤ d·w rows
    * before the shuffle, so the full-corpus frequency table never
    * materializes (the sketch's whole point: heavy-hitter counts over
    * 10^12 tokens in d·w longs, mergeable by cell-wise addition). */
  def cmsCells(values: DataFrame, valueCol: String,
               depth: Int = 4, width: Int = 64): DataFrame = {
    values.select(posexplode(array((0 until depth).map(r =>
        pmod(hash32(concat_ws("|", lit(r.toString), col(valueCol))), lit(width.toLong))): _*))
        .as(Seq("r", "b")))
      .groupBy("r", "b").agg(count(lit(1)).cast("long").as("cnt"))
  }

  /** Histogram quantile sketch: approximate quantiles from a ≤256-bucket
    * log-scale histogram, the mergeable alternative to an exact
    * sort-the-corpus quantile at 10^12 rows. Buckets are the engine's own
    * 1-byte length code ([[graft.core.LenByte]], 4-bit-mantissa floor —
    * the same code the reference stores per doc, `utils.h:58-73` analog),
    * so the sketch is the histogram a deployed index can keep for free.
    *
    * For each q‰-free percentile q ∈ qs: target rank = ⌈q·N/100⌉ (pure
    * integers), the estimate is the SMALLEST bucket floor whose cumulative
    * count reaches the target (a lower bound of the true quantile by
    * construction), reported next to the exact quantile (same rule over
    * the raw-value histogram) for self-audit.
    *
    * Scale shape: both histograms are partial-agg groupBys (256 buckets /
    * |distinct values| rows); cumulative counts come from an inequality
    * self-join on the TINY aggregated sets (broadcast, windowless — never
    * a global-order WindowExec over the corpus). */
  def histQuantiles(values: DataFrame, valueCol: String,
                    qs: Seq[Int]): DataFrame = {
    val spark = values.sparkSession
    import spark.implicits._
    val v = col(valueCol).cast("long")
    def cumOf(keyed: DataFrame): DataFrame = // (k, c) -> (k, cum)
      keyed.as("a").join(broadcast(keyed.as("b")), col("b.k") <= col("a.k"))
        .groupBy(col("a.k").as("k")).agg(sum(col("b.c")).cast("long").as("cum"))
    val bucketHist = values.select(graft.functions.functions.len_lossy(v).as("k"))
      .groupBy("k").agg(count(lit(1)).cast("long").as("c"))
    val valueHist = values.select(v.as("k"))
      .groupBy("k").agg(count(lit(1)).cast("long").as("c"))
    val n = values.agg(count(lit(1)).cast("long").as("n"))
    val qdf = qs.toDF("q").crossJoin(n)
      .select(col("q").cast("long").as("q"), col("n"),
        expr("(q * n + 99) div 100").as("target"))
    def pick(cum: DataFrame, as: String): DataFrame =
      qdf.join(broadcast(cum), col("cum") >= col("target"))
        .groupBy("q", "n", "target").agg(min(col("k")).as(as))
    pick(cumOf(bucketHist), "est_bucket")
      .join(pick(cumOf(valueHist), "exact").select("q", "exact"), "q")
      .select(col("q"), col("n"), col("target"), col("est_bucket"), col("exact"))
      .orderBy("q")
  }

  /** AMS (Alon–Matias–Szegedy) F₂ sketch: estimates the second frequency
    * moment Σ cf² — the SELF-JOIN SIZE on the value column, the number a
    * distributed planner needs to size a term-keyed join/shuffle before
    * running it. k ±1 counters with pinned md5 signs
    * (sign_i(v) = 2·(h("i|v") & 1) − 1); each counter accumulates
    * Σ_v sign_i(v)·w(v), and E[c_i²] = F₂ exactly (the AMS identity), so
    * the estimate is (Σ c_i²) div k in pure integer arithmetic. The exact
    * F₂ rides along for self-audit.
    *
    * Scale: input is the (value, weight) aggregate (one corpus-width
    * groupBy); the counter update is a ×k explode over that SMALL distinct
    * table into k partial-agg sums — counters merge by addition across any
    * partitioning, like every sketch here. Counter squares fit a BIGINT up
    * to ~3·10⁹ total weight; past that the same pipeline runs on
    * DecimalType(38) counters (DuckDB side: HUGEINT). */
  def amsF2(weighted: DataFrame, valueCol: String, weightCol: String,
            k: Int = 64): DataFrame = {
    val signed = weighted.select(
      posexplode(array((0 until k).map(i =>
        (hash32(concat_ws("|", lit(i.toString), col(valueCol)))
          .bitwiseAND(lit(1L)) * lit(2L) - lit(1L)) * col(weightCol)): _*))
        .as(Seq("i", "contrib")))
    val counters = signed.groupBy("i")
      .agg(sum(col("contrib")).cast("long").as("c"))
    val est = counters.agg(
      expr(s"(sum(c * c) div $k)").cast("long").as("est_f2"))
    val exact = weighted.agg(
      sum(col(weightCol) * col(weightCol)).cast("long").as("exact_f2"))
    val out = est.crossJoin(exact)
      .select(lit(k.toLong).as("k"), col("est_f2"), col("exact_f2"))
    val rows = out.collect()
    weighted.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** Point estimates from the sketch: min over rows of the probed cell —
    * never under the true count (CMS guarantee). `probes` keeps its other
    * columns; the cells side is ≤ d·w rows and broadcast-joins. */
  def cmsEstimate(cells: DataFrame, probes: DataFrame, probeCol: String,
                  depth: Int = 4, width: Int = 64): DataFrame = {
    val others = probes.columns.filterNot(_ == probeCol).map(col)
    val pb = probes.select(col(probeCol) +: others :+
      posexplode(array((0 until depth).map(r =>
        pmod(hash32(concat_ws("|", lit(r.toString), col(probeCol))), lit(width.toLong))): _*))
        .as(Seq("r", "b")): _*)
    pb.join(broadcast(cells), Seq("r", "b"), "left")
      .groupBy((col(probeCol) +: others).toIndexedSeq: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).cast("long").as("est"))
  }
}
