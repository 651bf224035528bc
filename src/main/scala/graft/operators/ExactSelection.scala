package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact distributed k-th order statistic by ITERATIVE histogram
  * refinement — the scale-safe replacement for the single-level probe +
  * in-bucket `orderBy().limit(k-before)` the q313/q323/q328 family used
  * through round 7 (reference counterpart: the exact-mode percentile path
  * behind `QueryEngine/TableFunctions`' quantile surface; structurally the
  * classic distributed selection via rank probing over value histograms).
  *
  * Why the old shape was a 100 TB hazard: after one fixed-width probe the
  * selected bucket's population is bounded only by data skew — a column
  * with billions of rows inside one 1000-wide value band funnels them all
  * through a single-partition GlobalLimit (and overflows the `.toInt` rank
  * before that). Here each level histograms the CURRENT candidate range
  * into `fanout` sub-buckets (one bounded aggregate; ≤ `fanout` rows ever
  * reach the driver), descends into the bucket holding the local rank, and
  * repeats until either
  *   - the candidate population fits in `cap` rows (then one bounded sort
  *     of ≤ cap rows finishes the selection), or
  *   - the bucket collapses to a single value (min == max), which IS the
  *     answer — this terminates on pathological all-equal skew that width
  *     refinement alone could never split.
  * The value range shrinks ×`fanout` per level, so levels stay ≤
  * log_fanout(range/ulp) ≈ a handful for any double column; each level is
  * one filtered scan + one ≤fanout-row aggregate, no global sort anywhere.
  *
  * `kthAll` serves MANY ranks from one pass structure: histogram collects
  * are memoized by refinement path, so q328's 16 equi-depth boundaries
  * share the single level-1 histogram instead of recomputing it 16 times.
  */
object ExactSelection {

  /** One selection result: the k-th smallest value, the number of
    * refinement levels walked, and the final candidate-set size actually
    * sorted (0 when a single-value bucket resolved the rank). `levels` /
    * `finalN` exist so specs can pin the bounded-sort contract.
    */
  final case class Kth(value: Double, levels: Int, finalN: Long)

  def kth(df: DataFrame, xcol: String, k: Long,
          cap: Long = 100000L, fanout: Int = 1000): Kth =
    kthAll(df, xcol, Seq(k), cap, fanout).head

  /** k-th smallest (1-based) of `df.xcol` (cast to double) for each rank
    * in `ks`. `cap` bounds the only sorted set; `fanout` the per-level
    * histogram width. Histograms are memoized across ranks by path.
    *
    * Ranks are over NON-NULL values: nulls are dropped up front (they
    * are orderable in neither engine's quantile semantics; counting
    * them into n0 would skew ranks vs the oracles' row_number over
    * non-null orderings, and a null histogram key would NPE the
    * driver-side collect — round-8 ADVICE).
    */
  def kthAll(df: DataFrame, xcol: String, ks: Seq[Long],
             cap: Long = 100000L, fanout: Int = 1000): Seq[Kth] = {
    val base = df.select(col(xcol).cast("double").as("x"))
      .filter(col("x").isNotNull && !isnan(col("x")))
    val h0 = base.agg(min(col("x")), max(col("x")), count(lit(1))).head()
    require(!h0.isNullAt(2) && h0.getLong(2) > 0, "empty selection input")
    val lo0 = h0.getDouble(0)
    val hi0 = h0.getDouble(1)
    val n0 = h0.getLong(2)
    // Memoized per refinement path: cur/lo/w are functions of the path,
    // so the collect (≤ fanout rows) is shared across ranks.
    val memo = mutable.HashMap.empty[List[Long], Array[Row]]
    def histAt(cur: DataFrame, path: List[Long],
               loC: Double, w: Double): Array[Row] =
      memo.getOrElseUpdate(path, {
        cur.groupBy(
            least(floor((col("x") - loC) / w), lit((fanout - 1).toLong))
              .cast("long").as("b"))
          .agg(count(lit(1)).as("c"), min(col("x")).as("mn"),
            max(col("x")).as("mx"))
          .collect().sortBy(_.getLong(0))
      })
    ks.map { k =>
      require(k >= 1 && k <= n0, s"rank $k out of [1, $n0]")
      var lo = lo0; var hi = hi0; var n = n0
      var kk = k
      var cur = base
      var path: List[Long] = Nil
      var levels = 0
      while (n > cap && lo < hi && levels < 64) {
        levels += 1
        val loC = lo
        val w = math.max((hi - loC) / fanout, java.lang.Double.MIN_NORMAL)
        val hist = histAt(cur, path, loC, w)
        var before = 0L
        var i = 0
        var selB = 0L; var selC = 0L; var selMn = 0.0; var selMx = 0.0
        var found = false
        while (i < hist.length && !found) {
          val c = hist(i).getLong(1)
          if (before + c >= kk) {
            found = true
            selB = hist(i).getLong(0); selC = c
            selMn = hist(i).getDouble(2); selMx = hist(i).getDouble(3)
          } else before += c
          i += 1
        }
        require(found, s"rank $kk not located at level $levels")
        kk -= before
        cur = cur.filter(
          least(floor((col("x") - loC) / w), lit((fanout - 1).toLong))
            .cast("long") === selB)
        path = selB :: path
        lo = selMn; hi = selMx; n = selC
      }
      require(n <= cap || lo == hi,
        s"refinement did not converge: n=$n after $levels levels")
      if (lo == hi) Kth(lo, levels, 0L)
      else {
        // n ≤ cap here, so kk fits an Int and the sort is bounded.
        val v = cur.orderBy(col("x")).limit(kk.toInt)
          .agg(max(col("x"))).head().getDouble(0)
        Kth(v, levels, n)
      }
    }
  }
}
