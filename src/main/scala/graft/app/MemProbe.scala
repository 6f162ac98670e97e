package graft.app

/** Memory-bandwidth ceiling probe: fixed total work of streaming xor
  * sweeps over per-thread buffers, run at a given thread count. Pure CPU
  * scaling on this box is measured by ScalingBench.calibrate; this probe
  * measures the MEMORY path the KG build actually stresses (sorts, hash
  * tables, shuffle buffers). Compare wall at 8 vs 32 threads (taskset'd)
  * to see where the box's bandwidth saturates.
  *
  * Usage: MemProbe <threads> <tasks> <mbPerTask>
  */
object MemProbe {
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val tasks = if (args.length > 1) args(1).toInt else 128
    val mb = if (args.length > 2) args(2).toInt else 64
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    val futures = (0 until tasks).map { t =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = {
          val n = mb * 1024 * 1024 / 8
          val a = new Array[Long](n)
          var h = 0x9e3779b97f4a7c15L + t
          var pass = 0
          while (pass < 4) {
            var i = 0
            while (i < n) { a(i) ^= h; h += a(i); i += 1 }
            pass += 1
          }
          h
        }
      })
    }
    val acc = futures.map(_.get()).sum
    val secs = (System.nanoTime() - t0) / 1e9
    val totalGb = tasks.toDouble * mb * 4 * 2 / 1024.0
    println(f"[mem-probe] threads=$threads tasks=$tasks mb=$mb wall=$secs%.1fs approxGBps=${totalGb / secs}%.1f (acc=${acc != 0})")
    pool.shutdown()
  }
}
