package graft.core

import org.apache.spark.sql.SparkSession

/** One place for the engine's SparkSession tuning, shared by every entry
  * point (Bench / Verify / ScalingBench / profiling apps / tests).
  *
  * The two SparkConf-level settings exist because of measured local-mode
  * anti-scaling at 32 threads (jstack evidence, round 3):
  *
  *   - `spark.storage.memoryMapThreshold=1g` — Spark memory-maps shuffle /
  *     disk-store blocks larger than 2 MB by default. munmap requires a
  *     TLB shootdown (an IPI to every CPU the process ran on), whose cost
  *     GROWS with core count — at 32 threads, 11 of 29 runnable executor
  *     threads sat inside mmap0/unmap0. Plain pread scales; mapping buys
  *     nothing for stream-once shuffle blocks.
  *
  *   - `KryoSerializer` — cached-RDD blocks that spill to disk (persisted
  *     intermediates, localCheckpoints) round-trip through
  *     `spark.serializer`; the JavaSerializer default showed up as
  *     ObjectInputStream hot frames on the same samples.
  *
  * Both are read at SparkContext construction, so they must be set on the
  * builder, not with `spark.conf.set` afterwards (the SQL-level tuning the
  * pipeline can set at runtime lives in BuildPipeline.run instead).
  */
object Sessions {

  def builder(master: String, appName: String,
              shufflePartitions: Int): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.storage.memoryMapThreshold", "1g")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    // diagnostic toggle: shuffle scratch on tmpfs — a single shared spinning
    // disk is not a per-executor resource on a real cluster
    sys.env.get("GRAFT_SHM_LOCALDIR").foreach { _ =>
      new java.io.File("/dev/shm/spark-graft").mkdirs()
      b.config("spark.local.dir", "/dev/shm/spark-graft")
    }
    b
  }

  def local(cores: Int, appName: String): SparkSession = {
    val s = builder(s"local[$cores]", appName, cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
