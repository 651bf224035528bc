package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AM (q511-q513) — seasonality detection,
  * distributional drift, and uncertainty-aware ranking:
  *
  *  - q511: single-bin DFT periodogram over the hourly revenue
  *    series at candidate periods {6, 12, 24, 168}h. The Goertzel
  *    recurrence is inherently sequential, but the DFT bin itself is
  *    a SUM: power(T) = (Σ x·cos(2πt/T))² + (Σ x·sin(2πt/T))² — and
  *    because the angle only depends on t mod T, the corpus first
  *    collapses to ≤T exact integer phase sums, the transcendental
  *    multiply runs on that bounded grain, each term is floored to
  *    whole cents (so libm's last-ulp cos differences can't leak
  *    into a float sum), and the squares are DECIMAL-lifted.
  *    Deterministic, one shuffle, dominant period flagged.
  *  - q512: QQ-drift between two document sources — deciles of the
  *    n_chars distribution per source from a value-grain cumulative
  *    histogram (char-length domain, never a corpus sort), the
  *    9-point QQ line fit by OLS on exact integer sums, plus the
  *    worst quantile gap. Slope≈1, intercept≈0 reads "same
  *    distribution"; KS/PSI (q407/q383) test, this CHARACTERIZES.
  *  - q513: Wilson-lower-bound ranking of per-brand return rates vs
  *    the raw-rate ranking — the classic fix for ranking small-n
  *    rates (complements q502's empirical-Bayes shrinkage with the
  *    frequentist interval answer). Brand grain (25 rows), windows
  *    bounded; rank shifts reported.
  */
object Round9Spectral {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q511_spectral_periodogram" -> ((s, d) => {
      val hourly = graft.Stage(t(s, d, "events")
        .groupBy(floor(unix_timestamp(col("ts")) / 3600L)
          .cast("long").as("hr"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("x")),
        "q511_hourly")
      val n = hourly.agg(count(lit(1)).as("n_hours"))
      val periods = Seq(6, 12, 24, 168)
      val perT = periods.map { tt =>
        hourly.groupBy((col("hr") % tt).as("ph"))
          .agg(sum(col("x")).as("sph"))
          .withColumn("ang",
            lit(2.0) * math.Pi * col("ph") / tt)
          .agg(
            sum(floor(col("sph").cast("double") * cos(col("ang")))
              .cast("long")).as("a"),
            sum(floor(col("sph").cast("double") * sin(col("ang")))
              .cast("long")).as("b"))
          .select(lit(tt.toLong).as("period_hours"),
            col("a"), col("b"))
      }
      val amps = perT.reduce(_ unionByName _)
        .crossJoin(broadcast(n))
        .withColumn("amp_cents",
          floor(sqrt((col("a").cast("decimal(38,0)") * col("a")
            + col("b").cast("decimal(38,0)") * col("b"))
            .cast("double")) / col("n_hours")).cast("long"))
      val w = Window.orderBy(col("amp_cents").desc,
        col("period_hours").asc) // 4-row period grain
      amps.withColumn("is_peak",
          when(row_number().over(w) === 1, 1L).otherwise(0L))
        .select(col("period_hours"), col("n_hours"), col("amp_cents"),
          col("is_peak"))
        .orderBy(col("period_hours"))
    }),

    "q512_qq_drift" -> ((s, d) => {
      def deciles(src: String, qn: String): DataFrame = {
        val h = t(s, d, "documents")
          .filter(col("source") === src)
          .groupBy(col("n_chars").as("v"))
          .agg(count(lit(1)).as("c"))
        val wc = Window.orderBy(col("v")) // char-length value grain
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = h.withColumn("cum", sum(col("c")).over(wc))
          .crossJoin(broadcast(
            h.agg(sum(col("c")).as("nn"))))
        val ks = (1 to 9).map { k =>
          cum.filter(col("cum") * 10 >= col("nn") * k)
            .agg(min(col("v")).as(qn))
            .select(lit(k.toLong).as("k"), col(qn))
        }
        ks.reduce(_ unionByName _)
      }
      val qq = deciles("src0", "qa").join(deciles("src1", "qb"), Seq("k"))
      qq.agg(count(lit(1)).as("n_points"),
        sum(col("qa")).as("sa"), sum(col("qb")).as("sb"),
        sum(col("qa") * col("qb")).as("sab"),
        sum(col("qa") * col("qa")).as("saa"),
        max(abs(col("qa") - col("qb"))).as("max_gap_chars"))
        .withColumn("slope",
          (col("n_points") * col("sab") - col("sa") * col("sb"))
            .cast("double")
            / (col("n_points") * col("saa") - col("sa") * col("sa"))
              .cast("double"))
        .select(col("n_points"),
          floor(col("slope") * 1e6).cast("long").as("slope_ppm"),
          floor((col("sb").cast("double")
            - col("slope") * col("sa").cast("double"))
            / col("n_points") * 100).cast("long").as("intercept_centi"),
          col("max_gap_chars"))
    }),

    "q513_wilson_ranking" -> ((s, d) => {
      val z = 1.96
      val br = t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")
          .select(col("p_partkey").as("l_partkey"), col("p_brand"))),
          Seq("l_partkey"))
        .groupBy(col("p_brand").as("brand"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("k"))
        .withColumn("p", col("k").cast("double") / col("n"))
        .withColumn("wilson",
          (col("p") + lit(z * z) / (lit(2.0) * col("n"))
            - lit(z) * sqrt(col("p") * (lit(1.0) - col("p")) / col("n")
              + lit(z * z) / (lit(4.0) * col("n") * col("n"))))
            / (lit(1.0) + lit(z * z) / col("n")))
      val wRaw = Window.orderBy(col("p").desc, col("brand").asc)
      val wWil = Window.orderBy(col("wilson").desc, col("brand").asc)
      br // brand grain: 25 rows
        .withColumn("raw_rank", row_number().over(wRaw).cast("long"))
        .withColumn("wilson_rank", row_number().over(wWil).cast("long"))
        .select(col("brand"), col("n"), col("k"),
          floor(col("p") * 1e6).cast("long").as("raw_ppm"),
          floor(col("wilson") * 1e6).cast("long").as("wilson_ppm"),
          col("raw_rank"), col("wilson_rank"),
          abs(col("raw_rank") - col("wilson_rank")).as("rank_shift"))
        .orderBy(col("brand"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q511_spectral_periodogram" -> {
      val per = Seq(6, 12, 24, 168).map { tt =>
        s"""p$tt AS (
           SELECT $tt::BIGINT AS period_hours,
                  sum(floor(CAST(sph AS DOUBLE)
                    * cos(2.0 * pi() * ph / $tt))::BIGINT)::BIGINT
                    AS a,
                  sum(floor(CAST(sph AS DOUBLE)
                    * sin(2.0 * pi() * ph / $tt))::BIGINT)::BIGINT
                    AS b
           FROM (SELECT hr % $tt AS ph, sum(x)::BIGINT AS sph
                 FROM hourly GROUP BY 1))"""
      }.mkString(",\n         ")
      s"""WITH hourly AS (
           SELECT floor(epoch(ts::TIMESTAMP) / 3600)::BIGINT AS hr,
                  sum(floor(value * 100)::BIGINT)::BIGINT AS x
           FROM events GROUP BY 1),
         n AS (SELECT count(*)::BIGINT AS n_hours FROM hourly),
         $per,
         amps AS (
           SELECT period_hours, n_hours,
                  floor(sqrt(CAST(a::HUGEINT * a + b::HUGEINT * b
                    AS DOUBLE)) / n_hours)::BIGINT AS amp_cents
           FROM (SELECT * FROM p6 UNION ALL SELECT * FROM p12
                 UNION ALL SELECT * FROM p24
                 UNION ALL SELECT * FROM p168), n)
         SELECT period_hours, n_hours, amp_cents,
                (CASE WHEN row_number() OVER (
                   ORDER BY amp_cents DESC, period_hours) = 1
                 THEN 1 ELSE 0 END)::BIGINT AS is_peak
         FROM amps ORDER BY period_hours"""
    },

    "q512_qq_drift" -> {
      def dec(src: String, qn: String) =
        s"""(SELECT k.k::BIGINT AS k,
              (SELECT min(v) FROM (
                 SELECT v, sum(c) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
                 FROM (SELECT n_chars AS v, count(*)::BIGINT AS c
                       FROM documents WHERE source = '$src'
                       GROUP BY 1))
               WHERE cum * 10 >= k.k *
                 (SELECT count(*) FROM documents
                  WHERE source = '$src'))::BIGINT AS $qn
            FROM range(1, 10) k(k))"""
      s"""WITH qq AS (
           SELECT a.k, a.qa, b.qb
           FROM ${dec("src0", "qa")} a
           JOIN ${dec("src1", "qb")} b ON a.k = b.k),
         sums AS (
           SELECT count(*)::BIGINT AS n_points,
                  sum(qa)::BIGINT AS sa, sum(qb)::BIGINT AS sb,
                  sum(qa * qb)::BIGINT AS sab,
                  sum(qa * qa)::BIGINT AS saa,
                  max(abs(qa - qb))::BIGINT AS max_gap_chars
           FROM qq),
         fit AS (
           SELECT n_points, sa, sb, max_gap_chars,
             CAST(n_points * sab - sa * sb AS DOUBLE)
               / CAST(n_points * saa - sa * sa AS DOUBLE) AS slope
           FROM sums)
         SELECT n_points,
                floor(slope * 1e6)::BIGINT AS slope_ppm,
                floor((CAST(sb AS DOUBLE) - slope * CAST(sa AS DOUBLE))
                  / n_points * 100)::BIGINT AS intercept_centi,
                max_gap_chars
         FROM fit"""
    },

    "q513_wilson_ranking" ->
      """WITH br AS (
           SELECT p.p_brand AS brand, count(*)::BIGINT AS n,
                  sum(CASE WHEN l.l_returnflag = 'R' THEN 1
                      ELSE 0 END)::BIGINT AS k
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           GROUP BY p.p_brand),
         wl AS (
           SELECT brand, n, k,
             CAST(k AS DOUBLE) / n AS p,
             (CAST(k AS DOUBLE) / n + (1.96 * 1.96) / (2.0 * n)
               - 1.96 * sqrt((CAST(k AS DOUBLE) / n)
                   * (1.0 - CAST(k AS DOUBLE) / n) / n
                 + (1.96 * 1.96) / (4.0 * n * n)))
               / (1.0 + (1.96 * 1.96) / n) AS wilson
           FROM br),
         rk AS (
           SELECT brand, n, k,
                  floor(p * 1e6)::BIGINT AS raw_ppm,
                  floor(wilson * 1e6)::BIGINT AS wilson_ppm,
                  row_number() OVER (ORDER BY p DESC, brand)::BIGINT
                    AS raw_rank,
                  row_number() OVER (ORDER BY wilson DESC, brand)
                    ::BIGINT AS wilson_rank
           FROM wl)
         SELECT brand, n, k, raw_ppm, wilson_ppm, raw_rank,
                wilson_rank,
                abs(raw_rank - wilson_rank)::BIGINT AS rank_shift
         FROM rk ORDER BY brand"""
  )
}
