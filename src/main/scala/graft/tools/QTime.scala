package graft.tools

/** Time one or more declared queries at the driver bench config:
  * `runMain graft.tools.QTime <query> [query…]` (sf dir via
  * SPARK_GRAFT_SF_DIR, cpus via SPARK_GRAFT_CPUS, reps via
  * SPARK_GRAFT_REPS, default 5). Prints min and median — on this drifting
  * box single samples spike 3-10×, and the MIN of several warm reps is the
  * robust before/after comparator (additive noise only inflates). Extra
  * session confs can be injected for A/B experiments via SPARK_GRAFT_CONF
  * ("k=v;k=v").
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val b0 = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    val b = sys.env.get("SPARK_GRAFT_CONF").map(_.split(';').filter(_.contains('='))
        .foldLeft(b0) { (bb, kv) =>
          val Array(k, v) = kv.split("=", 2); bb.config(k, v)
        }).getOrElse(b0)
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      // cold run first (layout/fixture/cache writes belong to it), untimed
      val rows = graft.SparkEntry.queries(q)(spark, sfDir).count()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[qtime] $q%-24s rows=$rows min=${ts.head}%.2f " +
        f"median=${ts(ts.length / 2)}%.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
