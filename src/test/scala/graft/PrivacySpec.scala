package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.Privacy

class PrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, TestSpark.sf)
  private lazy val out = Privacy.kAnonymize(docs).cache()

  test("published rows are k-anonymous: every gen_level<2 equivalence class has >= K members") {
    val classes = out.filter($"gen_level" < 2)
      .groupBy("lang", "source", "bucket_lo").count()
      .as[(String, String, Option[Long], Long)].collect()
    assert(classes.nonEmpty)
    classes.foreach { case (l, s, b, n) =>
      assert(n >= Privacy.K, s"class ($l,$s,$b) has $n < ${Privacy.K} members")
    }
  }

  test("generalization is a strict monotone coarsening of the raw QI") {
    val raw = docs.select($"doc_id", $"lang".as("rl"), $"source".as("rs"),
      (floor($"n_chars" / 200) * 200).cast("long").as("rb"))
    val joined = out.join(raw, "doc_id")
      .select($"gen_level", $"lang" === $"rl",
        $"source".isNull || $"source" === $"rs", $"bucket_lo".isNull || $"bucket_lo" === $"rb",
        when($"gen_level" === 0, $"bucket_lo".isNotNull && $"source".isNotNull)
          .when($"gen_level" === 1, $"bucket_lo".isNull && $"source".isNotNull)
          .otherwise($"bucket_lo".isNull && $"source".isNull))
      .as[(Int, Boolean, Boolean, Boolean, Boolean)].collect()
    joined.foreach { case (lvl, langOk, srcOk, bOk, shapeOk) =>
      assert(langOk && srcOk && bOk && shapeOk, s"level $lvl row violates coarsening")
    }
    assert(out.count() == docs.count(), "every document gets exactly one verdict")
  }

  test("audit and recode agree: under-k cell population equals the generalized row count") {
    val flagged = Privacy.kAnonAudit(docs).agg(sum("n")).as[Long].head()
    val generalized = out.filter($"gen_level" >= 1).count()
    assert(flagged == generalized, s"audit flags $flagged docs, recode generalized $generalized")
  }

  test("cell-count joins broadcast; no corpus-keyed window in the plan") {
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("Window"), "anonymization must not window over the corpus")
  }

  test("l-diversity audit flags exactly the under-diverse published classes") {
    import org.apache.spark.sql.functions.{col, md5, substring}
    val audit = Privacy.lDiversityAudit(docs)
      .select($"gen_level", $"lang", $"source", $"bucket_lo", $"n", $"diversity")
      .collect()
    // recompute per-class diversity directly from the published view
    val sens = docs.select(col("doc_id"),
      substring(md5(col("text")), 1, 1).as("sens"))
    val byClass = out.filter($"gen_level" < 2).join(sens, "doc_id")
      .collect()
      .groupBy(r => (r.getAs[Int]("gen_level"), r.getAs[String]("lang"),
        r.getAs[String]("source"),
        Option(r.getAs[java.lang.Long]("bucket_lo"))))
      .view.mapValues(rs => (rs.length.toLong, rs.map(_.getAs[String]("sens")).distinct.length.toLong))
      .toMap
    val failing = byClass.filter(_._2._2 < Privacy.LDiv)
    assert(audit.length == failing.size,
      s"audit reports ${audit.length} classes, brute-force finds ${failing.size}")
    audit.foreach { r =>
      val key = (r.getAs[Int]("gen_level"), r.getAs[String]("lang"),
        r.getAs[String]("source"), Option(r.getAs[java.lang.Long]("bucket_lo")))
      assert(failing.get(key).contains(
        (r.getAs[Long]("n"), r.getAs[Long]("diversity"))),
        s"audit row $key (${r.getAs[Long]("n")}, ${r.getAs[Long]("diversity")}) " +
          "does not match brute force")
    }
    // every failing class still met k (l-diversity is the SECOND gate)
    audit.foreach(r => assert(r.getAs[Long]("n") >= Privacy.K,
      "a published class below k slipped through the recode"))
  }

  test("t-closeness audit covers every published class with a valid TVD") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val audit = Privacy.tClosenessAudit(docs).collect()
    // one row per PUBLISHED equivalence class, no more, no less
    val published = Privacy.kAnonymize(docs)
      .filter(org.apache.spark.sql.functions.col("gen_level") < 2)
      .select("gen_level", "lang", "source", "bucket_lo").distinct().count()
    assert(audit.length == published,
      s"audit covers ${audit.length} classes, published view has $published")
    audit.foreach { r =>
      val tvd = r.getAs[Double]("tvd")
      assert(tvd >= 0.0 && tvd <= 1.0, s"TVD out of range: $tvd")
      assert(r.getAs[Int]("breach") == (if (tvd > Privacy.TClose) 1 else 0),
        "breach flag disagrees with its own threshold")
      assert(r.getAs[Long]("n") >= Privacy.K)
    }
    // the audit must actually discriminate on this corpus: small classes
    // sit far from the global mix, big ones close — both flags present
    assert(audit.exists(_.getAs[Int]("breach") == 1), "no breach found")
    assert(audit.exists(_.getAs[Int]("breach") == 0), "everything breached")
  }

  test("DP release: noise is bounded, non-degenerate, and deterministic") {
    import org.apache.spark.sql.functions._
    val rel = SparkEntry.queries("q_dp_release")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0),
        r.getAs[Double]("dp_count"), r.getAs[Double]("dp_sum")))
    val truth = Tables.documents(spark, TestSpark.sf).groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(least(col("n_chars"), lit(500.0))).as("cs"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1).toDouble, r.getDouble(2))).toMap
    assert(rel.nonEmpty)
    // |Laplace(b)| from a 2^20-grained inverse CDF is at most b·ln(2^21)
    val maxCount = math.log(2097152.0)
    rel.foreach { case (lang, dpc, dps) =>
      val (n, cs) = truth(lang)
      assert(math.abs(dpc - n) <= maxCount + 1e-9,
        s"$lang: count noise ${dpc - n} exceeds the mechanism's support")
      assert(math.abs(dps - cs) <= 500.0 * maxCount + 1e-9,
        s"$lang: sum noise ${dps - cs} exceeds the mechanism's support")
    }
    // non-degenerate: at least one group's release actually moved
    assert(rel.exists { case (l, dpc, _) => dpc != truth(l)._1 },
      "the release equals the raw census — no noise applied")
    // seeded: a second evaluation reproduces the release exactly
    val again = SparkEntry.queries("q_dp_release")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0),
        r.getAs[Double]("dp_count"), r.getAs[Double]("dp_sum")))
    assert(rel.sameElements(again), "release is not deterministic")
  }
}
