package graft.plans

/** Reference query-hint surface (`QueryEngine/QueryHint.h:65-94` in
  * /root/reference: "slash-star-plus hint [, hint]* star-slash" comment
  * hints parsed from Calcite, e.g. cpu_mode, columnar_output, watchdog,
  * allow_loop_join, max_join_hashtable_size, query_time_limit(N)).
  *
  * Spark-first mapping: Catalyst has its own comment-hint framework
  * (BROADCAST(t), MERGE, SHUFFLE_HASH, SHUFFLE_REPLICATE_NL,
  * REPARTITION, COALESCE), and the execution-tuning knobs the reference
  * hints control either do not exist in Spark (CUDA block sizes, GPU
  * mode, columnar output toggles — Tungsten always runs its columnar/
  * codegen pipeline) or are session confs rather than per-query hints
  * (watchdog ≈ spark.sql.broadcastTimeout / job-group interrupt,
  * loop-join controls ≈ autoBroadcastJoinThreshold). So reference hints
  * are accepted, parsed, RECORDED (so a caller can introspect them,
  * like the reference's RegisteredQueryHint), and stripped as semantic
  * no-ops — while any non-reference hint in the same comment block
  * (Spark-native like BROADCAST) is left in place for Catalyst.
  *
  * Exception with TEETH: keep_result / keep_table_function_result
  * activate HeavyEngine's result-set recycler (the DataRecycler analog,
  * `Tests/DataRecyclerTest.cpp`) — see HeavyEngine.sql.
  *
  * Closest live analogs, for callers that want teeth:
  *  - query_time_limit(ms) → HeavyEngine.withInterrupt + a timer;
  *  - disable_loop_join → fail if the plan contains a
  *    CartesianProduct/BNLJ (PlanAudit does this fleet-wide);
  *  - max_join_hashtable_size / force_*_hash_join → Spark picks join
  *    strategies from stats + AQE at runtime.
  */
object QueryHints {

  /** The full registered-hint name set, `QueryHint.h:65-94`. */
  val Known: Set[String] = Set(
    "cpu_mode", "columnar_output", "rowwise_output",
    "bbox_intersect_bucket_threshold", "bbox_intersect_max_size",
    "bbox_intersect_allow_gpu_build", "bbox_intersect_no_cache",
    "bbox_intersect_keys_per_bin",
    "keep_result", "keep_table_function_result",
    "aggregate_tree_fanout",
    "cuda_block_size", "cuda_grid_size_multiplier",
    "cuda_opt_block_and_grid_sizes",
    "watchdog", "dynamic_watchdog", "watchdog_off", "dynamic_watchdog_off",
    "query_time_limit",
    "allow_loop_join", "disable_loop_join",
    "loop_join_inner_table_max_num_rows",
    "max_join_hashtable_size",
    "force_baseline_hash_join", "force_one_to_many_hash_join",
    "watchdog_max_projected_rows_per_device",
    "preflight_count_query_threshold",
    "table_reordering_off", "ndv_groups_estimator_multiplier")

  /** name (lowercased) → raw args ("" when bare). */
  final case class Parsed(hints: Map[String, String], cleaned: String)

  private val HintBlock = """(?s)/\*\+(.*?)\*/""".r

  /** Split a hint list on top-level commas (args may contain commas). */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val HintToken = """(?s)(\w+)\s*(?:\((.*)\))?""".r

  /** Extract reference hints from every comment-hint block of `sql`;
    * recognized names are recorded and removed, everything else stays
    * for Catalyst. Empty residual blocks are dropped entirely.
    */
  def parse(sql: String): Parsed = {
    var hints = Map.empty[String, String]
    val cleaned = HintBlock.replaceAllIn(sql, m => {
      val kept = splitTop(m.group(1)).filter {
        case HintToken(name, args) if Known(name.toLowerCase) =>
          hints += name.toLowerCase -> Option(args).getOrElse("").trim
          false
        case _ => true
      }
      if (kept.isEmpty) " "
      else java.util.regex.Matcher.quoteReplacement(
        "/*+ " + kept.mkString(", ") + " */")
    })
    Parsed(hints, cleaned)
  }
}
