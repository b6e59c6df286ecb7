package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class VectorExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val a = Seq(1.0f, 2.0f, 3.0f)
  private val b = Seq(-1.0f, 0.5f, 2.0f)

  test("dot product matches hand computation on float arrays") {
    val df = Seq((a, b)).toDF("a", "b")
    val got = df.select(dot_product(col("a"), col("b"))).as[Double].head()
    assert(math.abs(got - (1.0 * -1.0 + 2.0 * 0.5 + 3.0 * 2.0)) < 1e-12)
  }

  test("cosine similarity of a vector with itself is 1") {
    val df = Seq((a, a)).toDF("a", "b")
    val got = df.select(cosine_sim(col("a"), col("b"))).as[Double].head()
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("cosine similarity of orthogonal vectors is 0") {
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 5.0))).toDF("a", "b")
    val got = df.select(cosine_sim(col("a"), col("b"))).as[Double].head()
    assert(math.abs(got) < 1e-12)
  }

  test("interpreted eval agrees with codegen") {
    val df = Seq((a, b)).toDF("a", "b")
    val gen = df.select(cosine_sim(col("a"), col("b"))).as[Double].head()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(cosine_sim(col("a"), col("b"))).as[Double].head()
      assert(gen == interp)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("zero-norm operand yields null, not NaN (both codegen and interpreted)") {
    val df = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0)), (Seq(1.0, 2.0), Seq(0.0, 0.0)))
      .toDF("a", "b")
    assert(df.select(cosine_sim(col("a"), col("b"))).collect().forall(_.isNullAt(0)))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try
      assert(df.select(cosine_sim(col("a"), col("b"))).collect().forall(_.isNullAt(0)))
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("null input yields null, not a crash") {
    val df = Seq((Option(a), Option.empty[Seq[Float]])).toDF("a", "b")
    val got = df.select(dot_product(col("a"), col("b"))).collect()
    assert(got.head.isNullAt(0))
  }

  test("brute-force cosine against real embeddings matches a Scala loop") {
    val rows = Tables.embeddings(spark, TestSpark.sf)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().take(10)
    def cosine(x: Seq[Float], y: Seq[Float]): Double = {
      val (dot, na, nb) = x.zip(y).foldLeft((0.0, 0.0, 0.0)) {
        case ((d, u, v), (xi, yi)) =>
          (d + xi.toDouble * yi.toDouble, u + xi.toDouble * xi.toDouble, v + yi.toDouble * yi.toDouble)
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val q = rows.head._2
    val df = Tables.embeddings(spark, TestSpark.sf).limit(10)
      .select(col("vec_id"), cosine_sim(col("embedding"), lit(q.toArray)).as("sim"))
      .as[(Long, Double)].collect().toMap
    rows.foreach { case (id, v) =>
      assert(math.abs(df(id) - cosine(q, v)) < 1e-9, s"vec $id")
    }
  }
}
