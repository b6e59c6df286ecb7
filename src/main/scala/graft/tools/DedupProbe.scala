package graft.tools
import org.apache.spark.sql.functions._
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    var t0 = System.nanoTime()
    val sigs = graft.dedup.Dedup.signatures(docs).persist()
    println(f"sigs=${sigs.count()} in ${(System.nanoTime()-t0)/1e9}%.2f s")
    t0 = System.nanoTime()
    val buckets = sigs.select(col("doc_id"), explode(graft.dedup.Dedup.bandHashes(col("sig"))).as("b"))
      .select(col("b.band").as("band"), col("b.bh").as("bh"), col("doc_id"))
    val bstats = buckets.groupBy("band","bh").count()
    println("top bucket sizes: " + bstats.orderBy(desc("count")).limit(5).collect().map(_.getLong(2)).mkString(","))
    val npairs = bstats.select(sum(col("count")*(col("count")-1)/2)).head.getDouble(0)
    println(f"raw candidate pairs (incl. dup across bands)=$npairs%.0f in ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
