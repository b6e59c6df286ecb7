package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables => T}

/** Linear quality probe — the "train a quality classifier on a labeled
  * slice, score the whole corpus" step of LLM corpus prep (the fastText /
  * linear-probe workflow, solved in closed form). No reference twin (the
  * reference has no model surface; its nearest analogue is the fixed
  * quantile threshold in `Gddp.scala:151`).
  *
  * The model is a 2-feature linear probability model fit by ordinary least
  * squares over the NORMAL-EQUATION MOMENTS: training is ONE hash aggregate
  * producing 9 doubles (n, Σx, Σxxᵀ, Σxy) — partial aggregation makes it
  * map-side-combined, so nothing row-sized crosses the shuffle at any corpus
  * size — and the 3×3 solve is Cramer's rule expressed as column arithmetic
  * on that single moment row. Scoring is a pure scan joined to the 1-row
  * weight table (broadcast, build side = 1 row), so the whole lifecycle is
  * train = one aggregate, score = one scan: the 100 TB shape.
  *
  * Cross-engine determinism: the only float-addition-order-dependent values
  * are the moment sums, rounded at 6 dp on both engines (the `q_embed_gram`
  * posture — double accumulation error is ~1e-11 at this scale, far below
  * the rounding grain). Everything downstream — Cramer, weights, scores —
  * is the SAME closed-form expression tree over those identical doubles, so
  * both engines compute bit-identical results; output rounding then only
  * canonicalizes display.
  *
  * Features are chosen IEEE-exact in both engines (integer casts and one
  * division; no transcendentals): x1 = chars/1000, x2 = lexical diversity.
  * Label: the curated sources src0–src9 (single-digit suffix, FIXTURES.md)
  * are the "high-quality" positives. Train/heldout split is the same
  * deterministic doc_id hash split as `q_split_assign`. (The harness corpus
  * draws text independently of the source tag, so held-out accuracy sits at
  * base rate by construction — the declared queries verify the fit/score/
  * eval mechanics; signal is a property of the corpus, not the operator.)
  */
object Probe extends QueryModule {
  import graft.text.TextAnalysis.tokens

  /** doc features + label; pure projection, no shuffle. */
  private def feats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      (length(col("text")).cast("double") / 1000).as("x1"),
      (size(array_distinct(tokens(col("text")))).cast("double") /
        size(tokens(col("text")))).as("x2"),
      when(length(col("source")) === 4, 1.0).otherwise(0.0).as("y"))

  private def train(docs: DataFrame): DataFrame =
    feats(docs.filter(col("doc_id") % 5 =!= 0))
  private def heldout(docs: DataFrame): DataFrame =
    feats(docs.filter(col("doc_id") % 5 === 0))

  /** The normal-equation moment row: one aggregate, 9 doubles out. */
  private def moments(tr: DataFrame): DataFrame =
    tr.agg(
      count(lit(1)).cast("double").as("n"),
      round(sum(col("x1")), 6).as("s1"),
      round(sum(col("x2")), 6).as("s2"),
      round(sum(col("y")), 6).as("sy"),
      round(sum(col("x1") * col("x1")), 6).as("s11"),
      round(sum(col("x1") * col("x2")), 6).as("s12"),
      round(sum(col("x2") * col("x2")), 6).as("s22"),
      round(sum(col("x1") * col("y")), 6).as("s1y"),
      round(sum(col("x2") * col("y")), 6).as("s2y"))

  /** Cramer's rule for [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]] · w = [sy,s1y,s2y].
    * The expression trees here mirror the oracle SQL token for token so both
    * engines execute the identical IEEE op sequence.
    */
  private def solved(m: DataFrame): DataFrame = {
    val (n, s1, s2, sy) = (col("n"), col("s1"), col("s2"), col("sy"))
    val (s11, s12, s22, s1y, s2y) = (col("s11"), col("s12"), col("s22"), col("s1y"), col("s2y"))
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)
    val det1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val det2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)
    m.select(n.cast("long").as("n_train"),
      (round(det0 / det, 8) + lit(0.0)).as("w0"),
      (round(det1 / det, 8) + lit(0.0)).as("w1"),
      (round(det2 / det, 8) + lit(0.0)).as("w2"))
  }

  /** Fitted weights as a 1-row table (metadata-sized; broadcast for scoring). */
  private[graft] def weights(s: SparkSession, d: String): DataFrame =
    solved(moments(train(T.documents(s, d))))

  /** OLS fit of the quality label: intercept + per-feature weights. */
  private def qProbeTrain(s: SparkSession, d: String): DataFrame =
    weights(s, d).orderBy("n_train")

  /** Held-out docs scored with the trained (rounded, hence cross-engine
    * identical) weights; top 20 by predicted quality. Scan + 1-row broadcast.
    */
  private def qProbeScore(s: SparkSession, d: String): DataFrame =
    heldout(T.documents(s, d))
      .crossJoin(broadcast(weights(s, d).drop("n_train")))
      .select(col("doc_id"), col("y").cast("int").as("label"),
        (round(col("w0") + col("w1") * col("x1") + col("w2") * col("x2"), 6) +
          lit(0.0)).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)

  /** Held-out confusion counts + accuracy at the 0.5 threshold — the eval a
    * pipeline gates a scored-corpus release on. One scan, one aggregate.
    */
  private def qProbeEval(s: SparkSession, d: String): DataFrame =
    heldout(T.documents(s, d))
      .crossJoin(broadcast(weights(s, d).drop("n_train")))
      .select(col("y"),
        (col("w0") + col("w1") * col("x1") + col("w2") * col("x2")).as("score"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("score") >= 0.5 && col("y") === 1.0, 1L).otherwise(0L)).as("tp"),
        sum(when(col("score") >= 0.5 && col("y") === 0.0, 1L).otherwise(0L)).as("fp"),
        sum(when(col("score") < 0.5 && col("y") === 1.0, 1L).otherwise(0L)).as("fn"),
        sum(when(col("score") < 0.5 && col("y") === 0.0, 1L).otherwise(0L)).as("tn"))
      .select(col("n_test"), col("tp"), col("fp"), col("fn"), col("tn"),
        round((col("tp") + col("tn")).cast("double") / col("n_test"), 6).as("accuracy"))
      .orderBy("n_test")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_probe_train" -> qProbeTrain,
    "q_probe_score" -> qProbeScore,
    "q_probe_eval" -> qProbeEval
  )

  /** Shared oracle CTE chain: features → moments (rounded 6 dp) → Cramer. */
  private val fitCte =
    """WITH feats AS (
      |  SELECT doc_id,
      |    CAST(length(text) AS DOUBLE) / 1000 AS x1,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS x2,
      |    CASE WHEN length(source) = 4 THEN 1.0 ELSE 0.0 END AS y
      |  FROM documents),
      |m AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n,
      |    round(sum(x1), 6) AS s1, round(sum(x2), 6) AS s2,
      |    round(sum(y), 6) AS sy,
      |    round(sum(x1*x1), 6) AS s11, round(sum(x1*x2), 6) AS s12,
      |    round(sum(x2*x2), 6) AS s22,
      |    round(sum(x1*y), 6) AS s1y, round(sum(x2*y), 6) AS s2y
      |  FROM feats WHERE doc_id % 5 <> 0),
      |w AS (
      |  SELECT CAST(n AS BIGINT) AS n_train,
      |    round((sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)
      |           + s2*(s1y*s12 - s11*s2y))
      |      / (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
      |           + s2*(s1*s12 - s11*s2)), 8) + 0.0 AS w0,
      |    round((n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)
      |           + s2*(s1*s2y - s1y*s2))
      |      / (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
      |           + s2*(s1*s12 - s11*s2)), 8) + 0.0 AS w1,
      |    round((n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
      |           + sy*(s1*s12 - s11*s2))
      |      / (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
      |           + s2*(s1*s12 - s11*s2)), 8) + 0.0 AS w2
      |  FROM m)
      |""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_probe_train" ->
      (fitCte + "SELECT n_train, w0, w1, w2 FROM w ORDER BY n_train"),
    "q_probe_score" ->
      (fitCte +
        """SELECT f.doc_id, CAST(f.y AS INT) AS label,
          |  round(w.w0 + w.w1*f.x1 + w.w2*f.x2, 6) + 0.0 AS score
          |FROM feats f CROSS JOIN w
          |WHERE f.doc_id % 5 = 0
          |ORDER BY score DESC, f.doc_id LIMIT 20""".stripMargin),
    "q_probe_eval" ->
      (fitCte +
        """, sc AS (
          |  SELECT f.y, w.w0 + w.w1*f.x1 + w.w2*f.x2 AS score
          |  FROM feats f CROSS JOIN w WHERE f.doc_id % 5 = 0)
          |SELECT count(*) AS n_test,
          |  CAST(sum(CASE WHEN score >= 0.5 AND y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
          |  CAST(sum(CASE WHEN score >= 0.5 AND y = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
          |  CAST(sum(CASE WHEN score < 0.5 AND y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
          |  CAST(sum(CASE WHEN score < 0.5 AND y = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
          |  round(CAST(sum(CASE WHEN (score >= 0.5) = (y = 1.0) THEN 1 ELSE 0 END)
          |    AS DOUBLE) / count(*), 6) AS accuracy
          |FROM sc ORDER BY n_test""".stripMargin)
  )
}
