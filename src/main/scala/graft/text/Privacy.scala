package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables => T}

/** Re-identification-risk operators for corpus publication: k-anonymity
  * auditing and global-recoding anonymization over quasi-identifier (QI)
  * columns — the release gate a training-data pipeline runs AFTER content
  * scrubbing (`q_pii_redact` removes identifiers IN the text; this bounds
  * what the metadata columns leak ABOUT each document's origin).
  *
  * Reference scope: no reference twin (the reference engine has no privacy
  * surface); generalization category per SURVEY.md §2B / the LLM-pipeline
  * mandate. Sweeney's k-anonymity model, Spark-first:
  *
  *  - The QI ladder is (lang, source, length-bucket) → (lang, source) →
  *    (lang) — each step a strict coarsening, applied per equivalence
  *    class, never per row (global recoding, so the published table's
  *    classes are exactly the audit's classes).
  *  - Every step is ONE hash aggregate over the QI key producing a
  *    CELL-sized count table (|langs|·|sources|·|buckets| rows — metadata-
  *    sized at any corpus scale) joined back broadcast. Data-sized work is
  *    two scans of the failing remainder; nothing shuffles the corpus by
  *    doc, and the plan carries no window over the full table.
  */
object Privacy extends QueryModule {

  /** Anonymity threshold: a QI cell with fewer members re-identifies. */
  val K = 3

  /** Quasi-identifier level 0: origin + a 200-char length band (document
    * length is a classic fingerprinting side channel). */
  private def withQi(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), col("source"),
      (floor(col("n_chars") / 200) * 200).cast("long").as("bucket_lo"))

  /** The audit: every level-0 QI cell below k, with its population —
    * what a data steward reviews before release. */
  def kAnonAudit(docs: DataFrame, k: Int = K): DataFrame =
    withQi(docs)
      .groupBy("lang", "source", "bucket_lo")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)

  /** Global-recoding anonymization: rows in under-k level-0 cells drop
    * the length band; rows still under-k at (lang, source) are WITHHELD
    * from release (gen_level 2, QI nulled) — so the k-anonymity guarantee
    * holds unconditionally over the published (gen_level < 2) rows: every
    * equivalence class there has ≥ k members by construction
    * (PrivacySpec-locked). Returns every document with its published QI
    * view and the generalization level applied. */
  def kAnonymize(docs: DataFrame, k: Int = K): DataFrame = {
    val l0 = withQi(docs)
    val c0 = l0.groupBy("lang", "source", "bucket_lo").agg(count(lit(1)).as("n0"))
    val j0 = l0.join(broadcast(c0), Seq("lang", "source", "bucket_lo"))
    val pass0 = j0.filter(col("n0") >= k)
      .select(col("doc_id"), col("lang"), col("source"), col("bucket_lo"),
        lit(0).as("gen_level"))
    val fail0 = j0.filter(col("n0") < k)
    val c1 = fail0.groupBy("lang", "source").agg(count(lit(1)).as("n1"))
    val j1 = fail0.join(broadcast(c1), Seq("lang", "source"))
    val pass1 = j1.filter(col("n1") >= k)
      .select(col("doc_id"), col("lang"), col("source"),
        lit(null).cast("long").as("bucket_lo"), lit(1).as("gen_level"))
    val pass2 = j1.filter(col("n1") < k)
      .select(col("doc_id"), col("lang"),
        lit(null).cast("string").as("source"),
        lit(null).cast("long").as("bucket_lo"), lit(2).as("gen_level"))
    pass0.unionByName(pass1).unionByName(pass2)
  }

  /** Diversity threshold: a published class whose SENSITIVE attribute
    * takes fewer than L distinct values leaks that attribute even at k
    * members (the homogeneity attack k-anonymity alone misses). */
  val LDiv = 3

  /** l-diversity audit (Machanavajjhala et al., ICDE 2006) over the
    * PUBLISHED k-anonymized view: for every released equivalence class
    * (gen_level < 2 — the withheld rows have no class to leak), the
    * distinct count of the sensitive attribute; classes below `l` are the
    * homogeneity-attack surface a steward must re-generalize or withhold.
    * The sensitive value here is a deterministic text-derived label (first
    * hex digit of the content MD5 — standing in for topic/diagnosis), so
    * the audit is oracle-checkable end to end. Same scale shape as the
    * k-audit: the class table is cell-sized, the sensitive join is one
    * corpus-keyed hash join, the distinct-count folds per class.
    */
  def lDiversityAudit(docs: DataFrame, k: Int = K, l: Int = LDiv): DataFrame = {
    val pub = kAnonymize(docs, k).filter(col("gen_level") < 2)
    val sens = docs.select(col("doc_id"),
      substring(md5(col("text")), 1, 1).as("sens"))
    pub.join(sens, "doc_id")
      .groupBy("gen_level", "lang", "source", "bucket_lo")
      .agg(count(lit(1)).as("n"), countDistinct(col("sens")).as("diversity"))
      .filter(col("diversity") < l)
  }

  /** Closeness threshold: a class whose sensitive-value distribution sits
    * farther than T (total-variation distance) from the global one leaks
    * by SKEW even when it is diverse — the third audit of the family. */
  val TClose = 0.7

  /** t-closeness audit (Li et al., ICDE 2007) over the published
    * k-anonymized view: for every released equivalence class, the
    * total-variation distance (the EMD of the paper for a categorical
    * sensitive attribute under uniform ground distance) between the
    * class's sensitive distribution and the GLOBAL published distribution;
    * classes beyond `t` are the skew-attack surface l-diversity misses
    * (a class can hold l distinct diagnoses and still be 90% "cancer").
    * Every class is returned with its distance and breach flag — the
    * steward's review sheet, not just the violations.
    *
    * Numerics: the distance is computed in INTEGER cross-products
    * (|cn·gtot − gn·ctot| summed, ONE division at the end) so the 4-decimal
    * rounding is bit-identical in any engine — no float-sum order hazard.
    * Scale shape: class table and sensitive alphabet are metadata-sized;
    * the only corpus-sized work is the one doc-keyed join + one aggregate.
    */
  def tClosenessAudit(docs: DataFrame, k: Int = K,
      t: Double = TClose): DataFrame = {
    val pub = kAnonymize(docs, k).filter(col("gen_level") < 2)
    val sens = docs.select(col("doc_id"),
      substring(md5(col("text")), 1, 1).as("sens"))
    // NULLed-out QI columns (generalization) are real class keys: fold
    // them to sentinels so every join/group below is null-safe, restore
    // at the output boundary
    val j = pub.join(sens, "doc_id")
      .select(col("gen_level"), col("lang"),
        coalesce(col("source"), lit("~")).as("src_k"),
        coalesce(col("bucket_lo"), lit(-1L)).as("blo_k"), col("sens"))
    // ONE (class × sens) aggregate; every marginal it needs — per-sens
    // global counts gn, per-class totals ctot, the global total gtot —
    // is a window sum over that metadata-sized cell table, so the
    // corpus-sized `j` subtree executes once (the r20 plan recomputed it
    // for gtot, g and cs separately and then cross-joined the sens
    // alphabet back against every class). Absent (class, sens) cells,
    // which the old alphabet cross-join materialized as cn = 0 rows,
    // fold in algebraically: their term is |0·gtot − gn·ctot| = gn·ctot,
    // and Σ_absent gn = gtot − Σ_present gn — exact integer identity.
    import org.apache.spark.sql.expressions.{Window => W}
    val classKey = Seq("gen_level", "lang", "src_k", "blo_k")
    val cs = j.groupBy((classKey :+ "sens").map(col): _*)
      .agg(count(lit(1)).as("cn"))
      .withColumn("gn", sum("cn").over(W.partitionBy("sens")))
      .withColumn("ctot", sum("cn").over(W.partitionBy(classKey.map(col): _*)))
      .withColumn("gtot", sum("cn").over(
        W.partitionBy().rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
    cs.groupBy((classKey ++ Seq("ctot", "gtot")).map(col): _*)
      .agg((sum(abs(col("cn") * col("gtot") - col("gn") * col("ctot"))) +
        col("ctot") * (col("gtot") - sum("gn"))).as("num"))
      .select(col("gen_level"), col("lang"),
        nullif(col("src_k"), lit("~")).as("source"),
        nullif(col("blo_k"), lit(-1L)).as("bucket_lo"),
        col("ctot").as("n"),
        round(col("num") / (lit(2.0) * col("ctot") * col("gtot")), 4).as("tvd"))
      .withColumn("breach", when(col("tvd") > t, 1).otherwise(0))
  }

  // ---- declared queries ----

  private def qKAnon(s: SparkSession, d: String): DataFrame =
    kAnonAudit(T.documents(s, d)).orderBy("lang", "source", "bucket_lo")

  private def qLDiversity(s: SparkSession, d: String): DataFrame =
    lDiversityAudit(T.documents(s, d))
      .orderBy(col("gen_level"), col("lang"), col("source"),
        col("bucket_lo").asc_nulls_first)

  private def qAnonymize(s: SparkSession, d: String): DataFrame =
    kAnonymize(T.documents(s, d)).orderBy("doc_id")

  private def qTCloseness(s: SparkSession, d: String): DataFrame =
    tClosenessAudit(T.documents(s, d))
      .orderBy(col("gen_level"), col("lang"), col("source").asc_nulls_first,
        col("bucket_lo").asc_nulls_first)

  /** Differentially private census release — the Laplace mechanism (Dwork
    * et al. 2006, the workhorse of DP reporting): per-language COUNT gets
    * Laplace(1/ε) noise (sensitivity 1), SUM clips each document's
    * contribution to [0, C] first (bounding the sensitivity) and adds
    * Laplace(C/ε). The uniform draw is a seeded inverse-CDF transform of a
    * per-group integer hash — deterministic HERE so the DuckDB oracle
    * reproduces the release bit-for-bit; a production release swaps the
    * uniform for a CSPRNG, everything else unchanged. Scale shape: one
    * hash aggregate to a |langs|-sized census; noise applies to the
    * census, never per row.
    */
  private val DpEps = 1.0
  private val DpClip = 500.0
  private def qDpRelease(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.Column
    def unif(idSum: Column, mult: Long): Column =
      ((idSum % 1048576L) * mult % 1048576L + lit(0.5)) / 1048576.0
    def lap(u: Column, b: Double): Column =
      -lit(b) * signum(u - 0.5) * log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    // seed accumulates pre-modded ids: the long sum stays exact past any
    // real corpus size (overflow would diverge from the oracle's HUGEINT)
    T.documents(s, d).groupBy("lang").agg(
        count(lit(1)).as("n"),
        sum(least(col("n_chars"), lit(DpClip)).cast("double")).as("clip_sum"),
        sum(col("doc_id") % 1048576L).as("id_sum"))
      .select(col("lang"),
        round(col("n") + lap(unif(col("id_sum"), 2654435761L), 1.0 / DpEps), 4)
          .as("dp_count"),
        round(col("clip_sum") +
          lap(unif(col("id_sum"), 1779033703L), DpClip / DpEps), 4)
          .as("dp_sum"))
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_k_anon" -> qKAnon,
    "q_anonymize" -> qAnonymize,
    "q_l_diversity" -> qLDiversity,
    "q_t_closeness" -> qTCloseness,
    "q_dp_release" -> qDpRelease
  )

  private val qiCte =
    """l0 AS (
      |  SELECT doc_id, lang, source,
      |         CAST(floor(n_chars / 200) * 200 AS BIGINT) AS bucket_lo
      |  FROM documents)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_k_anon" ->
      s"""WITH $qiCte
         |SELECT lang, source, bucket_lo, count(*) AS n
         |FROM l0 GROUP BY lang, source, bucket_lo
         |HAVING count(*) < 3
         |ORDER BY lang, source, bucket_lo""".stripMargin,
    "q_anonymize" ->
      s"""WITH $qiCte,
         |c0 AS (SELECT lang, source, bucket_lo, count(*) AS n0
         |       FROM l0 GROUP BY lang, source, bucket_lo),
         |j0 AS (SELECT l0.*, c0.n0 FROM l0
         |       JOIN c0 USING (lang, source, bucket_lo)),
         |fail0 AS (SELECT * FROM j0 WHERE n0 < 3),
         |c1 AS (SELECT lang, source, count(*) AS n1
         |       FROM fail0 GROUP BY lang, source),
         |j1 AS (SELECT fail0.*, c1.n1 FROM fail0 JOIN c1 USING (lang, source))
         |SELECT doc_id, lang, source, bucket_lo, 0 AS gen_level
         |FROM j0 WHERE n0 >= 3
         |UNION ALL
         |SELECT doc_id, lang, source, NULL, 1 FROM j1 WHERE n1 >= 3
         |UNION ALL
         |SELECT doc_id, lang, NULL, NULL, 2 FROM j1 WHERE n1 < 3
         |ORDER BY doc_id""".stripMargin,
    "q_l_diversity" ->
      s"""WITH $qiCte,
         |c0 AS (SELECT lang, source, bucket_lo, count(*) AS n0
         |       FROM l0 GROUP BY lang, source, bucket_lo),
         |j0 AS (SELECT l0.*, c0.n0 FROM l0
         |       JOIN c0 USING (lang, source, bucket_lo)),
         |fail0 AS (SELECT * FROM j0 WHERE n0 < 3),
         |c1 AS (SELECT lang, source, count(*) AS n1
         |       FROM fail0 GROUP BY lang, source),
         |j1 AS (SELECT fail0.*, c1.n1 FROM fail0 JOIN c1 USING (lang, source)),
         |pub AS (
         |  SELECT doc_id, lang, source, bucket_lo, 0 AS gen_level
         |  FROM j0 WHERE n0 >= 3
         |  UNION ALL
         |  SELECT doc_id, lang, source, NULL, 1 FROM j1 WHERE n1 >= 3),
         |sens AS (SELECT doc_id, substring(md5(text), 1, 1) AS sens
         |         FROM documents)
         |SELECT gen_level, lang, source, bucket_lo,
         |  count(*) AS n, count(DISTINCT sens.sens) AS diversity
         |FROM pub JOIN sens USING (doc_id)
         |GROUP BY gen_level, lang, source, bucket_lo
         |HAVING count(DISTINCT sens.sens) < 3
         |ORDER BY gen_level, lang, source, bucket_lo NULLS FIRST""".stripMargin,
    // same pub CTE; TVD in integer cross-products, one terminal division
    "q_t_closeness" ->
      s"""WITH $qiCte,
         |c0 AS (SELECT lang, source, bucket_lo, count(*) AS n0
         |       FROM l0 GROUP BY lang, source, bucket_lo),
         |j0 AS (SELECT l0.*, c0.n0 FROM l0
         |       JOIN c0 USING (lang, source, bucket_lo)),
         |fail0 AS (SELECT * FROM j0 WHERE n0 < 3),
         |c1 AS (SELECT lang, source, count(*) AS n1
         |       FROM fail0 GROUP BY lang, source),
         |j1 AS (SELECT fail0.*, c1.n1 FROM fail0 JOIN c1 USING (lang, source)),
         |pub AS (
         |  SELECT doc_id, lang, source, bucket_lo, 0 AS gen_level
         |  FROM j0 WHERE n0 >= 3
         |  UNION ALL
         |  SELECT doc_id, lang, source, NULL, 1 FROM j1 WHERE n1 >= 3),
         |sens AS (SELECT doc_id, substring(md5(text), 1, 1) AS sens
         |         FROM documents),
         |j AS (SELECT pub.gen_level, pub.lang,
         |        coalesce(pub.source, '~') AS src_k,
         |        coalesce(pub.bucket_lo, -1) AS blo_k, sens.sens
         |      FROM pub JOIN sens USING (doc_id)),
         |gt AS (SELECT count(*) AS gtot FROM j),
         |g AS (SELECT sens, count(*) AS gn FROM j GROUP BY sens),
         |cs AS (SELECT gen_level, lang, src_k, blo_k, sens, count(*) AS cn
         |       FROM j GROUP BY 1, 2, 3, 4, 5),
         |ct AS (SELECT gen_level, lang, src_k, blo_k, count(*) AS ctot
         |       FROM j GROUP BY 1, 2, 3, 4),
         |x AS (SELECT ct.gen_level, ct.lang, ct.src_k, ct.blo_k, ct.ctot,
         |        gt.gtot,
         |        abs(coalesce(cs.cn, 0) * gt.gtot - g.gn * ct.ctot) AS term
         |      FROM ct CROSS JOIN g CROSS JOIN gt
         |      LEFT JOIN cs ON cs.gen_level = ct.gen_level
         |        AND cs.lang = ct.lang AND cs.src_k = ct.src_k
         |        AND cs.blo_k = ct.blo_k AND cs.sens = g.sens)
         |SELECT gen_level, lang, nullif(src_k, '~') AS source,
         |  nullif(blo_k, -1) AS bucket_lo, ctot AS n,
         |  round(sum(term) / (2.0 * ctot * gtot), 4) AS tvd,
         |  CASE WHEN round(sum(term) / (2.0 * ctot * gtot), 4) > 0.7
         |       THEN 1 ELSE 0 END AS breach
         |FROM x GROUP BY gen_level, lang, src_k, blo_k, ctot, gtot
         |ORDER BY gen_level, lang, source NULLS FIRST,
         |  bucket_lo NULLS FIRST""".stripMargin,
    // the same seeded inverse-CDF Laplace draw, unrolled: u from the
    // group's id_sum via pure integer arithmetic, noise −b·sign·ln(1−2|·|)
    "q_dp_release" ->
      """WITH g AS (
        |  SELECT lang, count(*) AS n,
        |    CAST(sum(least(n_chars, 500)) AS DOUBLE) AS clip_sum,
        |    CAST(sum(doc_id % 1048576) AS BIGINT) AS id_sum
        |  FROM documents GROUP BY lang),
        |u AS (
        |  SELECT lang, n, clip_sum,
        |    ((id_sum % 1048576) * 2654435761 % 1048576 + 0.5) / 1048576.0 AS u1,
        |    ((id_sum % 1048576) * 1779033703 % 1048576 + 0.5) / 1048576.0 AS u2
        |  FROM g)
        |SELECT lang,
        |  round(n - 1.0 * sign(u1 - 0.5) * ln(1 - 2 * abs(u1 - 0.5)), 4)
        |    AS dp_count,
        |  round(clip_sum - 500.0 * sign(u2 - 0.5) * ln(1 - 2 * abs(u2 - 0.5)), 4)
        |    AS dp_sum
        |FROM u ORDER BY lang""".stripMargin
  )
}
