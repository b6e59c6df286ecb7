package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe for the DSv2 catalog surface (not part of the contract). */
object CatalogProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("catalog-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-cat").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)

    graft.operators.Snapshots.commit(spark, s"$wh/db/t",
      Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c")).toDF("k", "p", "s"))

    println("== select: " + spark.sql("SELECT * FROM graft.db.t ORDER BY k").collect().mkString(","))
    val cnt = spark.sql("SELECT count(*) FROM graft.db.t")
    cnt.explain("formatted")
    println("== count: " + cnt.collect().mkString(","))
    val mm = spark.sql("SELECT min(k), max(p), count(s) FROM graft.db.t")
    mm.explain("formatted")
    println("== minmax: " + mm.collect().mkString(","))
    val fil = spark.sql("SELECT k FROM graft.db.t WHERE k >= 2")
    fil.explain("formatted")
    println("== filter: " + fil.collect().mkString(","))
    spark.sql("INSERT INTO graft.db.t VALUES (4, 40.0, 'd')")
    println("== after insert: " + spark.sql("SELECT count(*) FROM graft.db.t").collect().mkString(","))
    spark.sql("DELETE FROM graft.db.t WHERE length(s) = 1 AND k = 2")
    println("== after delete: " + spark.sql("SELECT * FROM graft.db.t ORDER BY k").collect().mkString(","))
    println("== time travel v1: " + spark.sql("SELECT count(*) FROM graft.db.t VERSION AS OF 1").collect().mkString(","))
    try {
      spark.sql("UPDATE graft.db.t SET p = p + 1 WHERE k = 3")
      println("== update worked: " + spark.sql("SELECT * FROM graft.db.t ORDER BY k").collect().mkString(","))
    } catch { case e: Throwable => println("== UPDATE failed: " + e.getClass.getName + ": " + e.getMessage.take(300)) }
    try {
      Seq((3L, 99.0, "z"), (9L, 90.0, "i")).toDF("k", "p", "s").createOrReplaceTempView("src")
      spark.sql("""MERGE INTO graft.db.t t USING src s ON t.k = s.k
                  |WHEN MATCHED THEN UPDATE SET *
                  |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      println("== merge worked: " + spark.sql("SELECT * FROM graft.db.t ORDER BY k").collect().mkString(","))
    } catch { case e: Throwable => println("== MERGE failed: " + e.getClass.getName + ": " + e.getMessage.take(300)) }
    spark.stop()
  }
}
