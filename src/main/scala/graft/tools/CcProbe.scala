package graft.tools
import org.apache.spark.sql.functions._

/** Stage timing for the production dedup-clustering path at the bench config. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sfDir)
    for (round <- 1 to 2) {
      var t0 = System.nanoTime()
      val edges = graft.dedup.Dedup.minhashPairs(docs).select("doc1", "doc2")
        .localCheckpoint(true)
      println(f"[$round] edges=${edges.count()} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
      val comps = graft.dedup.Dedup.connectedComponents(edges)
      println(f"[$round] cc done in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
      val out = docs.select(col("doc_id"))
        .join(comps, docs("doc_id") === comps("id"), "left")
        .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("component"))
      println(f"[$round] join rows=${out.count()} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
