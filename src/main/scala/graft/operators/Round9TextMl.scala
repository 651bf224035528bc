package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AY (q547-q549) — graph/probabilistic text ML over the
  * documents corpus (public algorithms: TextRank [Mihalcea-Tarau 2004],
  * multinomial Naive Bayes [McCallum-Nigam 1998], and mutual-information
  * feature selection [Yang-Pedersen 1997]; reference surface: the text
  * UDTF family — tf_feature_similarity, the quality classifier — in
  * QueryEngine/TableFunctions).
  *
  *  - q547: corpus-level TextRank keywords — adjacent-token
  *    co-occurrence edges (window 2, content tokens ≥ 4 chars) over
  *    the en subcorpus, symmetric weighted graph, 8 damped PageRank
  *    rounds (d = 0.85) with the repo's round-12 float discipline
  *    (q291/q497), top-20 keywords in integer ppb. Edge construction
  *    is one token shuffle; the iteration runs on the vocabulary-
  *    bounded node table, corpus-size-independent.
  *  - q548: multinomial Naive Bayes language classifier — 80/20
  *    deterministic split on doc_id, Laplace-smoothed per-(class,
  *    token) log-likelihoods quantized to INTEGER micro-nats
  *    (floor(ln·1e6 + 0.5)) so the per-document score sums are exact
  *    integer arithmetic and the argmax cannot flip on engine float
  *    sum order. Unseen tokens take the class's smoothed default via
  *    coalesce after a class-crossed left join (|classes| = 5 — the
  *    cross is bounded). Readout: the confusion matrix.
  *  - q549: mutual information I(token presence; lang) per token at
  *    doc grain — counts aggregated exactly, MI evaluated as ONE fixed
  *    scalar expression over the 5-class count columns (no float
  *    aggregation order at all), top-15 in integer nano-nats.
  */
object Round9TextMl {

  type Q = (SparkSession, String) => DataFrame

  /** Canonical ascii tokenization shared with q364/q177. */
  private val sparkTok =
    """split(regexp_replace(trim(lower(text)), '[^a-z0-9 ]', ''), ' +')"""
  private val duckTok =
    """string_split_regex(regexp_replace(trim(lower(text)),
       '[^a-z0-9 ]', '', 'g'), ' +')"""

  private val langs = Seq("de", "en", "es", "fr", "zh")

  /** MI contribution of one (count a, class total nc) cell against
    * marginals m (token-side) and n (corpus): identical text in both
    * dialects. */
  private def miTerm(a: String, m: String, nc: String): String =
    s"""(CASE WHEN $a > 0 THEN
          (CAST($a AS DOUBLE) / CAST(n AS DOUBLE))
          * ln(CAST($a AS DOUBLE) * CAST(n AS DOUBLE)
               / (CAST($m AS DOUBLE) * CAST($nc AS DOUBLE)))
        ELSE 0.0 END)"""

  private val miExpr: String = {
    val terms = langs.map { l =>
      miTerm(s"p_$l", "n1", s"nc_$l") + " + " +
        miTerm(s"(nc_$l - p_$l)", "(n - n1)", s"nc_$l")
    }
    s"CAST(floor((${terms.mkString(" + ")}) * 1e9 + 0.5) AS BIGINT)"
  }

  val queries: Seq[(String, Q)] = Seq(

    "q547_textrank_keywords" -> ((s, d) => {
      val arrs = t(s, d, "documents")
        .filter(col("lang") === "en")
        .select(expr(
          s"filter($sparkTok, x -> length(x) >= 4)").as("arr"))
        .filter(size(col("arr")) >= 2)
      val pairs = arrs.select(explode(expr(
        """arrays_zip(slice(arr, 1, size(arr) - 1),
                      slice(arr, 2, size(arr) - 1))""")).as("z"))
        .select(col("z.0").as("u"), col("z.1").as("v"))
        .filter(col("u") =!= col("v"))
      val edges = graft.Stage(
        pairs.unionByName(pairs.select(col("v").as("u"),
            col("u").as("v")))
          .groupBy(col("u"), col("v"))
          .agg(count(lit(1)).cast("double").as("w")), "q547_edges")
      val wdeg = edges.groupBy(col("u"))
        .agg(sum(col("w")).as("wd"))
      val nodes = wdeg.select(col("u").as("node"))
      val nN = nodes.agg(count(lit(1)).as("nn"))
      var pr = nodes.crossJoin(broadcast(nN))
        .select(col("node"), (lit(1.0) / col("nn")).as("p"))
        .localCheckpoint(true)
      for (_ <- 1 to 8) {
        val contrib = edges
          .join(broadcast(wdeg), Seq("u"))
          .join(broadcast(pr), edges("u") === pr("node"))
          .groupBy(col("v"))
          .agg(sum(col("p") * col("w") / col("wd")).as("inp"))
        pr = nodes.crossJoin(broadcast(nN))
          .join(contrib, col("node") === col("v"), "left")
          .select(col("node"),
            round(lit(0.15) / col("nn")
              + lit(0.85) * coalesce(col("inp"), lit(0.0)), 12)
              .as("p"))
          .localCheckpoint(true) // vocab-bounded rows, cut lineage
      }
      val ranked = pr
        .select(col("node").as("keyword"),
          floor(col("p") * 1e9).cast("long").as("pr_ppb"))
      val wAll = Window.orderBy(col("pr_ppb").desc, col("keyword"))
      // vocabulary-bounded window (distinct content tokens), not corpus
      ranked.withColumn("rk", row_number().over(wAll))
        .filter(col("rk") <= 20)
        .select(col("keyword"), col("pr_ppb"),
          col("rk").cast("long").as("rk"))
        .orderBy(col("rk"))
    }),

    "q548_naive_bayes_langid" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          expr(s"filter($sparkTok, x -> x <> '')").as("arr"))
      val train = docs.filter(col("doc_id") % 5 =!= 0)
      val test = docs.filter(col("doc_id") % 5 === 0)
      val trainToks = train.select(col("lang"),
        explode(col("arr")).as("tok"))
      val cw = trainToks.groupBy(col("lang"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val totc = cw.groupBy(col("lang"))
        .agg(sum(col("tf")).as("tot"))
      val vocab = cw.select(col("tok")).distinct()
        .agg(count(lit(1)).as("v"))
      val nTrain = train.agg(count(lit(1)).as("ntr"))
      val classes = broadcast(train.groupBy(col("lang"))
        .agg(count(lit(1)).as("nc"))
        .join(totc, Seq("lang"))
        .crossJoin(vocab).crossJoin(nTrain)
        .select(col("lang").as("cls"),
          expr("""CAST(floor(ln(CAST(nc AS DOUBLE) / ntr) * 1e6 + 0.5)
                  AS BIGINT)""").as("prior_micro"),
          expr("""CAST(floor(-ln(CAST(tot + v AS DOUBLE)) * 1e6 + 0.5)
                  AS BIGINT)""").as("w0"),
          col("tot"), col("v")))
      val weights = cw.join(broadcast(totc), Seq("lang"))
        .crossJoin(broadcast(vocab))
        .select(col("lang").as("cls"), col("tok"),
          expr("""CAST(floor((ln(CAST(tf + 1 AS DOUBLE))
                  - ln(CAST(tot + v AS DOUBLE))) * 1e6 + 0.5)
                  AS BIGINT)""").as("w"))
      val testToks = test.select(col("doc_id"),
          col("lang").as("true_lang"), explode(col("arr")).as("tok"))
        .groupBy(col("doc_id"), col("true_lang"), col("tok"))
        .agg(count(lit(1)).as("cnt"))
      val scored = testToks
        .crossJoin(classes.select(col("cls"), col("prior_micro"),
          col("w0")))
        .join(weights, Seq("cls", "tok"), "left")
        .groupBy(col("doc_id"), col("true_lang"), col("cls"))
        .agg((first(col("prior_micro"))
          + sum(col("cnt") * coalesce(col("w"), col("w0"))))
          .as("score_micro"))
      val wDoc = Window.partitionBy(col("doc_id"))
        .orderBy(col("score_micro").desc, col("cls"))
      scored.withColumn("rn", row_number().over(wDoc))
        .filter(col("rn") === 1)
        .groupBy(col("true_lang"), col("cls").as("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("true_lang"), col("pred_lang"))
    }),

    "q549_mutual_info_features" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          expr(s"filter($sparkTok, x -> x <> '')").as("arr"))
      val present = docs
        .select(col("doc_id"), col("lang"),
          explode(array_distinct(col("arr"))).as("tok"))
      val pCols = langs.map(l => sum(when(col("lang") === l, 1L)
        .otherwise(0L)).as(s"p_$l"))
      val perTok = present.groupBy(col("tok"))
        .agg(pCols.head, pCols.tail: _*)
      val mCols = count(lit(1)).as("n") +:
        langs.map(l => sum(when(col("lang") === l, 1L)
          .otherwise(0L)).as(s"nc_$l"))
      val margins = broadcast(docs.agg(mCols.head, mCols.tail: _*))
      val mi = perTok.crossJoin(margins)
        .withColumn("n1",
          langs.map(l => col(s"p_$l")).reduce(_ + _))
        .filter(col("n1") >= 10)
        .select(col("tok"), col("n1").as("docs_with"),
          expr(miExpr).as("mi_nano"))
      val wAll = Window.orderBy(col("mi_nano").desc, col("tok"))
      mi.withColumn("rk", row_number().over(wAll))
        .filter(col("rk") <= 15)
        .select(col("tok"), col("docs_with"), col("mi_nano"),
          col("rk").cast("long").as("rk"))
        .orderBy(col("rk"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q547_textrank_keywords" -> {
      val rounds = (1 to 8).map { k =>
        s"""p$k AS (
           SELECT n.node,
                  round(0.15 / (SELECT nn FROM nn)
                    + 0.85 * coalesce(c.inp, 0.0), 12) AS p
           FROM nodes n LEFT JOIN (
             SELECT e.v, sum(p.p * e.w / wd.wd) AS inp
             FROM edges e
             JOIN wdeg wd ON e.u = wd.u
             JOIN p${k - 1} p ON e.u = p.node
             GROUP BY e.v) c ON n.node = c.v)"""
      }.mkString(",\n         ")
      s"""WITH arrs AS (
           SELECT list_filter($duckTok, x -> len(x) >= 4) AS arr
           FROM documents WHERE lang = 'en'),
         rawp AS (
           SELECT z[1] AS u, z[2] AS v
           FROM (SELECT unnest(list_zip(arr[:-2], arr[2:])) AS z
                 FROM arrs WHERE len(arr) >= 2)
           WHERE z[1] <> z[2]),
         edges AS (
           SELECT u, v, CAST(count(*) AS DOUBLE) AS w FROM (
             SELECT u, v FROM rawp
             UNION ALL SELECT v, u FROM rawp)
           GROUP BY u, v),
         wdeg AS (
           SELECT u, sum(w) AS wd FROM edges GROUP BY u),
         nodes AS (SELECT u AS node FROM wdeg),
         nn AS (SELECT count(*)::BIGINT AS nn FROM nodes),
         p0 AS (
           SELECT node, 1.0 / (SELECT nn FROM nn) AS p FROM nodes),
         $rounds,
         ranked AS (
           SELECT node AS keyword,
                  floor(p * 1e9)::BIGINT AS pr_ppb,
                  row_number() OVER (ORDER BY floor(p * 1e9) DESC,
                    node) AS rk
           FROM p8)
         SELECT keyword, pr_ppb, rk::BIGINT AS rk
         FROM ranked WHERE rk <= 20 ORDER BY rk"""
    },

    "q548_naive_bayes_langid" ->
      s"""WITH docs AS (
           SELECT doc_id, lang,
                  list_filter($duckTok, x -> x <> '') AS arr
           FROM documents),
         train AS (SELECT * FROM docs WHERE doc_id % 5 <> 0),
         test AS (SELECT * FROM docs WHERE doc_id % 5 = 0),
         traintoks AS (
           SELECT lang, unnest(arr) AS tok FROM train),
         cw AS (
           SELECT lang, tok, count(*)::BIGINT AS tf FROM traintoks
           GROUP BY lang, tok),
         totc AS (
           SELECT lang, sum(tf)::BIGINT AS tot FROM cw GROUP BY lang),
         vocab AS (
           SELECT count(DISTINCT tok)::BIGINT AS v FROM cw),
         ntr AS (SELECT count(*)::BIGINT AS ntr FROM train),
         classes AS (
           SELECT g.lang AS cls,
                  CAST(floor(ln(CAST(g.nc AS DOUBLE) / r.ntr) * 1e6
                    + 0.5) AS BIGINT) AS prior_micro,
                  CAST(floor(-ln(CAST(tc.tot + vb.v AS DOUBLE)) * 1e6
                    + 0.5) AS BIGINT) AS w0
           FROM (SELECT lang, count(*)::BIGINT AS nc FROM train
                 GROUP BY lang) g
           JOIN totc tc ON g.lang = tc.lang, vocab vb, ntr r),
         weights AS (
           SELECT cw.lang AS cls, cw.tok,
                  CAST(floor((ln(CAST(cw.tf + 1 AS DOUBLE))
                    - ln(CAST(tc.tot + vb.v AS DOUBLE))) * 1e6 + 0.5)
                    AS BIGINT) AS w
           FROM cw JOIN totc tc ON cw.lang = tc.lang, vocab vb),
         testtoks AS (
           SELECT doc_id, true_lang, tok, count(*)::BIGINT AS cnt
           FROM (SELECT doc_id, lang AS true_lang, unnest(arr) AS tok
                 FROM test)
           GROUP BY doc_id, true_lang, tok),
         scored AS (
           SELECT tt.doc_id, tt.true_lang, c.cls,
                  (any_value(c.prior_micro)
                   + sum(tt.cnt * coalesce(w.w, c.w0)))::BIGINT
                    AS score_micro
           FROM testtoks tt
           CROSS JOIN classes c
           LEFT JOIN weights w ON w.cls = c.cls AND w.tok = tt.tok
           GROUP BY tt.doc_id, tt.true_lang, c.cls),
         pred AS (
           SELECT true_lang, cls AS pred_lang,
                  row_number() OVER (PARTITION BY doc_id
                    ORDER BY score_micro DESC, cls) AS rn
           FROM scored)
         SELECT true_lang, pred_lang, count(*)::BIGINT AS n_docs
         FROM pred WHERE rn = 1
         GROUP BY true_lang, pred_lang
         ORDER BY true_lang, pred_lang""",

    "q549_mutual_info_features" -> {
      val pCols = langs.map(l =>
        s"sum(CASE WHEN lang = '$l' THEN 1 ELSE 0 END)::BIGINT AS p_$l")
        .mkString(", ")
      val ncCols = langs.map(l =>
        s"sum(CASE WHEN lang = '$l' THEN 1 ELSE 0 END)::BIGINT AS nc_$l")
        .mkString(", ")
      val n1 = langs.map(l => s"p_$l").mkString(" + ")
      s"""WITH docs AS (
           SELECT doc_id, lang,
                  list_filter($duckTok, x -> x <> '') AS arr
           FROM documents),
         present AS (
           SELECT DISTINCT doc_id, lang, unnest(arr) AS tok
           FROM (SELECT doc_id, lang, list_distinct(arr) AS arr
                 FROM docs)),
         pertok AS (
           SELECT tok, $pCols FROM present GROUP BY tok),
         pertok2 AS (
           SELECT *, ($n1)::BIGINT AS n1 FROM pertok),
         margins AS (
           SELECT count(*)::BIGINT AS n, $ncCols FROM docs),
         mi AS (
           SELECT tok, n1 AS docs_with, $miExpr AS mi_nano
           FROM pertok2, margins
           WHERE n1 >= 10),
         ranked AS (
           SELECT *, row_number() OVER (ORDER BY mi_nano DESC, tok)
                    AS rk
           FROM mi)
         SELECT tok, docs_with, mi_nano, rk::BIGINT AS rk
         FROM ranked WHERE rk <= 15 ORDER BY rk"""
    }
  )
}
