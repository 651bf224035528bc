package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's named query;
  * `oracleSql` carries the DuckDB-dialect equivalent for the hash-compare
  * correctness gate (omitted for non-SQL-expressible ops → rows-only check).
  */
object SparkEntry {

  private val modules: Seq[(Seq[(String, (SparkSession, String) => DataFrame)],
      Seq[(String, String)])] = Seq(
    (operators.Relational.queries, operators.Relational.oracles),
    (operators.Windows.queries, operators.Windows.oracles),
    (operators.Arrays.queries, operators.Arrays.oracles),
    (operators.TextAnalysis.queries, operators.TextAnalysis.oracles),
    (operators.Dedup.queries, operators.Dedup.oracles),
    (operators.TableFunctions.queries, operators.TableFunctions.oracles),
    (operators.Geo.queries, operators.Geo.oracles),
    (operators.Multimodal.queries, operators.Multimodal.oracles),
    (operators.ApproxAggs.queries, operators.ApproxAggs.oracles),
    (operators.SqlSurface.queries, operators.SqlSurface.oracles),
    (operators.DdlDml.queries, operators.DdlDml.oracles),
    (operators.MLFunctions.queries, operators.MLFunctions.oracles),
    (operators.RangeJoin.queries, operators.RangeJoin.oracles),
    (operators.AsofJoin.queries, operators.AsofJoin.oracles),
    (operators.SkewJoin.queries, operators.SkewJoin.oracles),
    (operators.NullSemantics.queries, operators.NullSemantics.oracles),
    (operators.AnnIvf.queries, operators.AnnIvf.oracles),
    (operators.TaxiParity.queries, operators.TaxiParity.oracles),
    (operators.FlightsParity.queries, operators.FlightsParity.oracles),
    (operators.SyntheticParity.queries, operators.SyntheticParity.oracles),
    (operators.TpcH.queries, operators.TpcH.oracles),
    (operators.LogsParity.queries, operators.LogsParity.oracles),
    (operators.HptParity.queries, operators.HptParity.oracles),
    (operators.Dsir.queries, operators.Dsir.oracles),
    (operators.Retrieval.queries, operators.Retrieval.oracles),
    (operators.DataOps.queries, operators.DataOps.oracles),
    (operators.ProductAnalytics.queries, operators.ProductAnalytics.oracles),
    (operators.MixturePlanning.queries, operators.MixturePlanning.oracles),
    (operators.Similarity.queries, operators.Similarity.oracles),
    (operators.WebCorpus.queries, operators.WebCorpus.oracles),
    (operators.Profiling.queries, operators.Profiling.oracles),
    (operators.OpsDiagnostics.queries, operators.OpsDiagnostics.oracles),
    (operators.GraphAnalytics.queries, operators.GraphAnalytics.oracles),
    (operators.Round8Ops.queries, operators.Round8Ops.oracles),
    (operators.Round9Ops.queries, operators.Round9Ops.oracles),
    (operators.Round9Stats.queries, operators.Round9Stats.oracles),
    (operators.Round9Sys.queries, operators.Round9Sys.oracles),
    (operators.Round9Assoc.queries, operators.Round9Assoc.oracles),
    (operators.Round9Forecast.queries, operators.Round9Forecast.oracles),
    (operators.Round9Text.queries, operators.Round9Text.oracles),
    (operators.Round9Mining.queries, operators.Round9Mining.oracles),
    (operators.Round9Causal.queries, operators.Round9Causal.oracles),
    (operators.Round9Synopsis.queries, operators.Round9Synopsis.oracles),
    (operators.Round9Decomp.queries, operators.Round9Decomp.oracles),
    (operators.Round9Layout.queries, operators.Round9Layout.oracles),
    (operators.Round9MlOps.queries, operators.Round9MlOps.oracles),
    (operators.Round9Snap.queries, operators.Round9Snap.oracles),
    (operators.Round9Audit.queries, operators.Round9Audit.oracles),
    (operators.Round9Graphs.queries, operators.Round9Graphs.oracles),
    (operators.Round9Bom.queries, operators.Round9Bom.oracles),
    (operators.Round9Ledger.queries, operators.Round9Ledger.oracles),
    (operators.Round9Curves.queries, operators.Round9Curves.oracles),
    (operators.Round9Patterns.queries, operators.Round9Patterns.oracles),
    (operators.Round9Inference.queries, operators.Round9Inference.oracles),
    (operators.Round9Net.queries, operators.Round9Net.oracles),
    (operators.Round9Rank.queries, operators.Round9Rank.oracles),
    (operators.Round9Temporal.queries, operators.Round9Temporal.oracles),
    (operators.Round9Behavior.queries, operators.Round9Behavior.oracles),
    (operators.Round9Econ.queries, operators.Round9Econ.oracles),
    (operators.Round9Hygiene.queries, operators.Round9Hygiene.oracles),
    (operators.Round9Signals.queries, operators.Round9Signals.oracles),
    (operators.Round9Monitor.queries, operators.Round9Monitor.oracles),
    (operators.Round9Market.queries, operators.Round9Market.oracles),
    (operators.Round9Portfolio.queries, operators.Round9Portfolio.oracles),
    (operators.Round9Sketch.queries, operators.Round9Sketch.oracles),
    (operators.Round9Motifs.queries, operators.Round9Motifs.oracles),
    (operators.Round9Bloom.queries, operators.Round9Bloom.oracles),
    (operators.Round9Correlate.queries, operators.Round9Correlate.oracles),
    (operators.Round9Extremes.queries, operators.Round9Extremes.oracles),
    (operators.Round9Stationarity.queries, operators.Round9Stationarity.oracles),
    (operators.Round9Spectral.queries, operators.Round9Spectral.oracles),
    (operators.Round9Audit2.queries, operators.Round9Audit2.oracles),
    (operators.Round9Distance.queries, operators.Round9Distance.oracles),
    (operators.Round9Lattice.queries, operators.Round9Lattice.oracles),
    (operators.Round9Payback.queries, operators.Round9Payback.oracles),
    (operators.Round9Sequential.queries, operators.Round9Sequential.oracles),
    (operators.Round9Tails.queries, operators.Round9Tails.oracles),
    (operators.Round9Anova2.queries, operators.Round9Anova2.oracles),
    (operators.Round9Diagnostics.queries, operators.Round9Diagnostics.oracles),
    (operators.Round9Venn.queries, operators.Round9Venn.oracles),
    (operators.Round9Attribution.queries, operators.Round9Attribution.oracles),
    (operators.Round9Filters.queries, operators.Round9Filters.oracles),
    (operators.Round9TextMl.queries, operators.Round9TextMl.oracles),
    (operators.Round9Planner.queries, operators.Round9Planner.oracles),
    (operators.Round9Bootstrap.queries, operators.Round9Bootstrap.oracles),
    (operators.Round9Phonetic.queries, operators.Round9Phonetic.oracles),
    (operators.Round9Communities.queries, operators.Round9Communities.oracles),
    (operators.Round9Outliers.queries, operators.Round9Outliers.oracles),
    (operators.Round9Normalize.queries, operators.Round9Normalize.oracles),
    (operators.Round9Process.queries, operators.Round9Process.oracles),
    (operators.Round9RankTests.queries, operators.Round9RankTests.oracles),
    (operators.Round9Advisor.queries, operators.Round9Advisor.oracles),
    (operators.Round9Commerce.queries, operators.Round9Commerce.oracles),
    (operators.EvalMetrics.queries, operators.EvalMetrics.oracles),
    (operators.DataQuality.queries, operators.DataQuality.oracles),
    (operators.OpsIntegrity.queries, operators.OpsIntegrity.oracles),
    (sources.Sources.queries, sources.Sources.oracles),
    (streaming.StreamingIngest.queries, streaming.StreamingIngest.oracles)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_agg_basic")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = modules.flatMap(_._1)
    require(all.map(_._1).distinct.size == all.size,
      "duplicate query ids: " + all.groupBy(_._1).collect {
        case (k, vs) if vs.size > 1 => k
      }.mkString(", "))
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_._2).toMap
}
