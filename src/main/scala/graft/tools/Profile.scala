package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev tool: per-query execution profile at the bench config — jobs, stages,
  * tasks, summed task time vs wall time, shuffle bytes — so optimization
  * targets scheduling overhead vs compute with evidence (guide §1). Not part
  * of the driver contract.
  */
object Profile {
  class Acc extends SparkListener {
    var jobs = 0
    var stages = 0
    var tasks = 0
    var taskTimeMs = 0L
    var gcMs = 0L
    var shuffleReadB = 0L
    var shuffleWriteB = 0L
    var fetchWaitMs = 0L
    val stageRows = mutable.ArrayBuffer.empty[(Int, String, Int, Long)]
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages += 1
      val info = s.stageInfo
      stageRows += ((info.stageId, info.name.take(60), info.numTasks,
        info.taskMetrics.executorRunTime))
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks += 1
      val m = t.taskMetrics
      if (m != null) {
        taskTimeMs += m.executorRunTime
        gcMs += m.jvmGCTime
        shuffleReadB += m.shuffleReadMetrics.totalBytesRead
        fetchWaitMs += m.shuffleReadMetrics.fetchWaitTime
        shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    val spark = sys.env.get("SPARK_GRAFT_CONF")
      .map(_.split(';').filter(_.contains('='))
        .foldLeft(b0) { (bb, kv) =>
          val Array(k, v) = kv.split("=", 2); bb.config(k, v)
        }).getOrElse(b0).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/region.parquet").count() // warm
    args.foreach { n =>
      // warm run (codegen + caches), then profiled run
      graft.SparkEntry.queries(n)(spark, sfDir).count()
      val acc = new Acc
      spark.sparkContext.addSparkListener(acc)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir).count()
      val wallMs = (System.nanoTime() - t0) / 1e6
      Thread.sleep(400) // let the listener bus drain
      spark.sparkContext.removeSparkListener(acc)
      println(f"PROFILE $n%-26s wall=${wallMs}%.0fms jobs=${acc.jobs} " +
        f"stages=${acc.stages} tasks=${acc.tasks} taskTime=${acc.taskTimeMs}ms " +
        f"gc=${acc.gcMs}ms shufR=${acc.shuffleReadB / 1024}KB " +
        f"shufW=${acc.shuffleWriteB / 1024}KB fetchWait=${acc.fetchWaitMs}ms")
      acc.stageRows.sortBy(-_._4).take(8).foreach { case (id, name, nt, rt) =>
        println(f"    stage $id%4d tasks=$nt%3d runTime=${rt}ms  $name")
      }
    }
    spark.stop()
  }
}
