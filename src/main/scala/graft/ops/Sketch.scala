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
}
