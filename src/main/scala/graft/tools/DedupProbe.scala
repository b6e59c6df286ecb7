package graft.tools

/** One-off stage timing for the LSH dedup clustering path. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name time=${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    val docs = graft.Tables.documents(spark, sfDir)
    t("warm_parquet")(docs.count())
    t("signatures_persist")(graft.dedup.Dedup.prepareSignatures(spark, sfDir))
    t("minhash_pairs")(graft.dedup.Dedup.minhashPairs(docs).count())
    val edges = graft.dedup.Dedup.minhashPairs(docs).select("doc1", "doc2")
    t("connected_components")(graft.dedup.Dedup.connectedComponents(edges).count())
    t("full_query_1")(graft.SparkEntry.queries("q_dedup_cluster_lsh")(spark, sfDir).count())
    t("full_query_2")(graft.SparkEntry.queries("q_dedup_cluster_lsh")(spark, sfDir).count())
    spark.stop()
  }
}
