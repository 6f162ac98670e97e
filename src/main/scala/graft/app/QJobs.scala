package graft.app

import org.apache.spark.scheduler._

/** Per-JOB accounting for one SparkEntry query (guide §1/§7: attribute
  * seconds to concrete jobs before touching anything): runs the named
  * query once with the engine session and prints, per Spark job, the wall
  * between job start and end, summed executor task time, shuffle bytes
  * written, and the first graft call-site frame — the decomposition QTime
  * can't see (a query with eager stage cuts runs many jobs).
  *
  * Usage: runMain graft.app.QJobs <sfDir> <query>
  */
object QJobs {

  private case class J(var t0: Long = 0L, var t1: Long = 0L, var site: String = "?")

  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-qjobs")
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val taskNs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    val shufW = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = new J(System.nanoTime())
        j.site = e.stageInfos.lastOption.map { si =>
          si.details.linesIterator.find(l => l.contains("graft.") && !l.contains("QJobs"))
            .getOrElse(si.name).trim.take(100)
        }.getOrElse("?")
        jobs.put(e.jobId, j)
        e.stageIds.foreach(s => stageJob.put(s, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.t1 = System.nanoTime()
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        val jid = stageJob.getOrDefault(e.stageInfo.stageId, -1)
        if (m != null && jid >= 0) {
          taskNs.computeIfAbsent(jid, _ => new java.util.concurrent.atomic.AtomicLong)
            .addAndGet(m.executorRunTime * 1000000L)
          shufW.computeIfAbsent(jid, _ => new java.util.concurrent.atomic.AtomicLong)
            .addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(args(1))(spark, args(0)).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1500)
    println(f"[qjobs] ${args(1)} wall=$wall%.3f s rows=$n")
    import scala.jdk.CollectionConverters._
    jobs.asScala.toVector.sortBy(_._1).foreach { case (id, j) =>
      val w = if (j.t1 > j.t0) (j.t1 - j.t0) / 1e9 else Double.NaN
      val tt = Option(taskNs.get(id)).map(_.get / 1e9).getOrElse(0.0)
      val sw = Option(shufW.get(id)).map(_.get / 1048576.0).getOrElse(0.0)
      println(f"[qjobs]   job=$id%3d wall=$w%7.3f task=$tt%7.1f shufW=$sw%8.1f MiB  ${j.site}")
    }
    spark.stop()
  }
}
