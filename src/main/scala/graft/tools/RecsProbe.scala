package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev tool: stage-by-stage timing of the q_recs_eval pipeline so the
  * repeated-subtree cost is measured, not guessed. Mirrors
  * Behavioral.qRecsEval's structure.
  */
object RecsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"RECSPROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val T = graft.Tables
    for (pass <- 1 to 3) {
      println(s"--- pass $pass")
      val bk = time("baskets build/hit")(
        graft.PersistedCache(spark, ("itemcf-baskets", sfDir))(
          T.lineitem(spark, sfDir)
            .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()))
      val ords = T.orders(spark, sfDir).select(col("o_orderkey").as("ok"),
        col("o_custkey").as("ck"), col("o_orderdate").as("odate"))
      val pairs = ords.join(bk, "ok")
        .groupBy("ck", "pk").agg(max("odate").as("d1"), max("ok").as("k1"))
      val cw = Window.partitionBy("ck")
        .orderBy(col("d1").desc, col("k1").desc, col("pk").desc)
      val ranked = pairs
        .withColumn("rn", row_number().over(cw))
        .withColumn("npairs", count(lit(1)).over(Window.partitionBy("ck")))
        .filter(col("npairs") >= 2)
      time("ranked noop")(noop(ranked))
      val held = ranked.filter(col("rn") === 1)
        .select(col("ck"), col("pk").as("held"))
      val training = ranked.filter(col("rn") > 1).select("ck", "pk")
      val trainBk = bk.join(ords.select("ok", "ck"), "ok")
        .join(held.withColumnRenamed("held", "pk"), Seq("ck", "pk"), "left_anti")
        .select("ok", "pk").distinct()
      time("trainBk noop")(noop(trainBk))
      val cooc = trainBk.select(col("ok"), col("pk").as("a"))
        .join(trainBk.select(col("ok"), col("pk").as("b")), "ok")
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("nab"))
      time("cooc noop")(noop(cooc))
      val nb5 = graft.analytics.Behavioral.neighborsFromCounts(cooc,
        trainBk.groupBy("pk").agg(count(lit(1)).as("n")))
      time("nb5 noop")(noop(nb5))
      val scores = training.join(broadcast(nb5), col("pk") === col("a"))
        .groupBy(col("ck"), col("b").as("item")).agg(sum("c").as("score"))
      time("scores noop")(noop(scores))
      time("full q_recs_eval")(
        graft.SparkEntry.queries("q_recs_eval")(spark, sfDir).count())
    }
    spark.stop()
  }
}
