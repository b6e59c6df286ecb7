package graft.tools
object DedupBench {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q_dedup_minhash","q_dedup_simhash")) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").count()
      println(f"$q rows=$n time=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
