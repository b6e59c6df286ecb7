package graft.tools
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the LSH dedup path (signatures →
  * band buckets → candidate join → exact verify) at the bench config, so
  * the expensive subtree is identified by measurement, not guess.
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sfDir)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"LSHPROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val sigs = graft.dedup.Dedup.sigsCached(spark, sfDir)
      time("sigs (cached) count")(sigs.count())
      val buckets = sigs.select(col("doc_id"),
          explode(graft.dedup.Dedup.bandHashes(col("sig"))).as("b"))
        .select(col("b.band").as("band"), col("b.bh").as("bh"), col("doc_id"))
      time("buckets noop")(noop(buckets))
      val l = buckets.select(col("band"), col("bh"), col("doc_id").as("doc1"))
      val r = buckets.select(col("band"), col("bh"), col("doc_id").as("doc2"))
      val cand = l.join(r, Seq("band", "bh")).filter(col("doc1") < col("doc2"))
        .select("doc1", "doc2").distinct()
      time("cand join+distinct noop")(noop(cand))
      val verified = cand
        .join(sigs.select(col("doc_id").as("doc1"), col("shingles").as("sh1"),
          col("sig").as("sig1")), "doc1")
        .join(sigs.select(col("doc_id").as("doc2"), col("shingles").as("sh2"),
          col("sig").as("sig2")), "doc2")
        .withColumn("est_jaccard", round(
          aggregate(zip_with(col("sig1"), col("sig2"), (a, b) => when(a === b, 1).otherwise(0)),
            lit(0), (acc, x) => acc + x).cast("double") / graft.dedup.Dedup.NumPerms, 4))
        .withColumn("jaccard", round(
          size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
            size(array_union(col("sh1"), col("sh2"))), 4))
        .filter(col("jaccard") >= 0.5)
      time("verify join noop")(noop(verified))
      time("full minhashPairsOf")(
        graft.dedup.Dedup.minhashPairsOf(sigs).count())
      time("uncached signatures noop")(noop(graft.dedup.Dedup.signatures(docs)))
    }
    spark.stop()
  }
}
