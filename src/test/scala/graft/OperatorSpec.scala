package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

class OperatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("every declared query runs and every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, TestSpark.sf)
      assert(df.columns.nonEmpty, name)
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1 pricing aggregates are internally consistent") {
    val rows = graft.operators.Aggregates.q1Pricing(spark, TestSpark.sf)
      .select("sum_qty", "avg_qty", "count_order")
      .as[(Double, Double, Long)].collect()
    rows.foreach { case (sum, avg, n) =>
      assert(math.abs(sum / n - avg) < 0.01, s"avg inconsistent: $sum/$n vs $avg")
    }
  }

  test("semi and anti joins partition the customer table") {
    val c = Tables.customer(spark, TestSpark.sf).count()
    val semi = SparkEntry.queries("q_join_semi")(spark, TestSpark.sf).count()
    val anti = SparkEntry.queries("q_join_anti")(spark, TestSpark.sf).count()
    assert(semi + anti == c)
  }

  test("intersect/except results are consistent with their inputs") {
    val oks = Tables.orders(spark, TestSpark.sf).select("o_orderkey").distinct().count()
    val inter = SparkEntry.queries("q_intersect")(spark, TestSpark.sf).count()
    val exc = SparkEntry.queries("q_except")(spark, TestSpark.sf).count()
    assert(inter <= oks && exc <= oks)
  }

  test("language ID prefers the profile language on crafted text") {
    val df = Seq(
      (1L, "the cat and the dog went to the park for a walk in the sun"),
      (2L, "el perro y el gato que estaba en la casa con los amigos"),
      (3L, "le chat et le chien pour les amis dans les maisons"),
      (4L, "xyzzy qwerty plugh")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "en"); assert(got(2L) == "es")
    assert(got(3L) == "fr"); assert(got(4L) == "und")
  }

  test("fingerprint is order-sensitive (dedup vs reordered text)") {
    val fp = Seq((1L, "a b c"), (2L, "c b a"), (3L, "a b c"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(3L) && fp(1L) != fp(2L))
  }

  test("multimodal PNG round-trip: our encoder -> JDK ImageIO decoder, per-pixel") {
    val decoded = graft.multimodal.Multimodal
      .decodeImages(graft.multimodal.Multimodal.pngAssets(spark, TestSpark.sf))
      .as[graft.multimodal.Multimodal.DecodedImage].collect()
    assert(decoded.nonEmpty)
    decoded.foreach { r =>
      val id = r.asset_id
      assert(r.width == (8 + id % 9).toInt && r.height == (8 + (id * 7) % 9).toInt)
      val expected = (0 until r.width * r.height)
        .map(i => ((id * 31 + i.toLong * 7) % 251).toInt).mkString(",")
      assert(r.pixel_csv == expected, s"pixel mismatch for asset $id")
    }
  }

  test("multimodal stub decode is deterministic and shaped") {
    val a = graft.multimodal.Multimodal.assets(spark, TestSpark.sf)
    val d1 = graft.multimodal.Multimodal.decodeFeatures(a)
      .select("asset_id", "width", "height").as[(Long, Int, Int)].collect().sorted
    val d2 = graft.multimodal.Multimodal.decodeFeatures(a)
      .select("asset_id", "width", "height").as[(Long, Int, Int)].collect().sorted
    assert(d1.sameElements(d2))
    assert(d1.forall { case (_, w, h) => w >= 16 && h >= 0 })
  }
}
