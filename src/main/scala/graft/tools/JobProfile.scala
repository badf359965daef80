package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev profiler (guide §1.1 without the UI): runs a SparkEntry query
  * with the noop sink and prints, per job, its wall and stage breakdown
  * (task count, summed task time, shuffle read/write bytes), plus the
  * query-level totals — the empirical answer to "is this query's wall
  * task work or driver/scheduling overhead".
  *
  * Usage: sbt "runMain graft.tools.JobProfile <sfDir> <query> [query...]"
  * Env: SPARK_GRAFT_CPUS (default 32).
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class St(var n: Int = 0, var taskMs: Long = 0L, var shR: Long = 0L,
      var shW: Long = 0L, var in: Long = 0L, var name: String = "")
    val stages = mutable.Map.empty[Int, St]
    val jobWindows = mutable.ArrayBuffer.empty[(Int, Long, Long, Int)]
    val jobStart = mutable.Map.empty[Int, (Long, Int)]
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val s = stages.getOrElseUpdate(t.stageId, St())
        s.n += 1
        val m = t.taskMetrics
        if (m != null) {
          s.taskMs += m.executorRunTime
          s.shR += m.shuffleReadMetrics.totalBytesRead
          s.shW += m.shuffleWriteMetrics.bytesWritten
          s.in += m.inputMetrics.bytesRead
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.getOrElseUpdate(sc.stageInfo.stageId, St()).name =
          sc.stageInfo.name
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobStart(j.jobId) = (j.time, j.stageIds.size)
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobStart.remove(j.jobId).foreach { case (t0, nst) =>
          jobWindows += ((j.jobId, t0, j.time, nst))
        }
    }
    spark.sparkContext.addSparkListener(listener)

    for (name <- names; round <- 1 to 2) {
      stages.clear(); jobWindows.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the async listener bus drain
      val nJobs = jobWindows.size
      val nStages = stages.size
      val taskMs = stages.values.map(_.taskMs).sum
      val shR = stages.values.map(_.shR).sum
      val shW = stages.values.map(_.shW).sum
      val inB = stages.values.map(_.in).sum
      // driver gap: wall minus the union of job windows = time no job ran
      val windows = jobWindows.sortBy(_._2)
      var covered = 0L; var hi = 0L
      for ((_, s, e, _) <- windows) {
        val s2 = math.max(s, hi)
        if (e > s2) { covered += e - s2; hi = e } else hi = math.max(hi, e)
      }
      println(f"[jobprofile] $name round $round: wall=$wall%.2f s "
        + f"jobs=$nJobs stages=$nStages tasks=${stages.values.map(_.n).sum} "
        + f"taskTime=${taskMs / 1000.0}%.2f s inJobWall=${covered / 1000.0}%.2f s "
        + f"driverGap=${wall - covered / 1000.0}%.2f s "
        + f"input=${inB / 1048576.0}%.1f MiB shufR=${shR / 1048576.0}%.1f MiB shufW=${shW / 1048576.0}%.1f MiB")
      if (round == 2 && sys.env.contains("JOBPROFILE_STAGES")) {
        for ((id, s) <- stages.toSeq.sortBy(_._1))
          println(f"  stage $id%4d tasks=${s.n}%4d taskMs=${s.taskMs}%6d "
            + f"shR=${s.shR}%9d shW=${s.shW}%9d in=${s.in}%9d ${s.name.take(90)}")
      }
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
