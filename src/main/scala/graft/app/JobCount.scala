package graft.app

import graft.core.Corpus
import graft.extract.DeterministicExtractor
import graft.pipeline.BuildPipeline
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Fixed-overhead accounting for the end-to-end build (guide §1: measure
  * first): counts Spark jobs and stages for one build and prints each
  * job's first relevant call site, so the ~F = jobs x scheduling-latency
  * Amdahl floor at bench sizes (BENCH/BASELINE.md "Reading the numbers
  * honestly") can be attributed to concrete code paths and cut.
  *
  * Usage: JobCount [nDocs] [cores]
  */
object JobCount {

  private class Acc extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val taskNs = new java.util.concurrent.atomic.AtomicLong
    val sites = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      jobs.incrementAndGet()
      stages.addAndGet(e.stageInfos.size)
      val site = e.stageInfos.lastOption.map { si =>
        val d = si.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("JobCount"))
          .getOrElse(si.name)
        s"${si.name.takeWhile(_ != '\n').take(60)} @ ${d.trim.take(90)}"
      }.getOrElse("?")
      sites.add(site)
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val m = e.stageInfo.taskMetrics
      if (m != null) taskNs.addAndGet(m.executorRunTime * 1000000L)
    }
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 6000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = graft.core.Sessions.local(cores, "graft-job-count")
    spark.sparkContext.setLogLevel("ERROR")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    val t0 = System.nanoTime()
    val n = BuildPipeline.run(Corpus.docs(spark, nDocs), new DeterministicExtractor)
      .triples.count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1500)
    println(f"[job-count] docs=$nDocs triples=$n wall=$wall%.1fs " +
      f"jobs=${acc.jobs.get} stages=${acc.stages.get} " +
      f"taskTime=${acc.taskNs.get / 1e9}%.1fs")
    import scala.jdk.CollectionConverters._
    val bySite = acc.sites.asScala.toVector.groupBy(identity)
      .map { case (s, v) => (v.size, s) }.toVector.sortBy(-_._1)
    bySite.take(40).foreach { case (c, s) => println(f"  $c%3d x $s") }
    spark.stop()
  }
}
