package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus.toInt, "graft-verify")
    new java.io.File(outDir).mkdirs()
    // Write oracle_sql.json FIRST — it depends only on class-init state
    // (SparkEntry.oracleSql), not on any query having run. Round 4 proved
    // the cost of ordering it last: a SIGKILL mid-loop zeroed the entire
    // round's correctness file even though every already-written query
    // parquet was fine. With the SQL on disk up front, a mid-run kill
    // costs only the queries that had not yet run.
    writeOracleJson(outDir)
    // Sweep stale oracle-export dirs left by DEAD Verify processes: the
    // export path is PID-scoped (SparkEntry.OracleExportDir) and the
    // harness consumes it after this JVM exits, so the current run must
    // not delete its own — but prior runs' dirs would otherwise
    // accumulate full stage exports in /tmp forever.
    sweepStaleExports()
    // Side-write the KG build's stage tables to the fixed oracle-export
    // path FIRST: the kg_* DuckDB oracles replay the downstream algebra
    // over these exports (read_parquet on absolute paths), and the
    // oracle pass runs after all queries — see SparkEntry.OracleExportDir.
    try SparkEntry.exportForOracles(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[verify] oracle export failed: ${e.getMessage}")
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // no cache sweep here: the kg_* entries deliberately share the
      // memoized build's stage caches across queries, and this process
      // exits after one pass — handle-less entries leak at most one slim
      // RDD each for its remainder (Bench, which loops, does sweep)
    }
    spark.stop()
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def writeOracleJson(outDir: String): Unit = {
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    ()
  }

  /** Delete `/tmp/graft-oracle-export-<pid>` dirs whose owning process is
    * gone. Never touches the current PID's dir (the harness reads it
    * after exit) or a live concurrent run's. */
  private def sweepStaleExports(): Unit = {
    val self = ProcessHandle.current().pid()
    val tmp = new java.io.File("/tmp")
    val pat = "graft-oracle-export-(\\d+)".r
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    Option(tmp.listFiles()).getOrElse(Array.empty).foreach { f =>
      f.getName match {
        case pat(pid) if pid.toLong != self &&
          !ProcessHandle.of(pid.toLong).map[Boolean](_.isAlive).orElse(false) =>
          try rm(f) catch { case _: Throwable => () }
        case _ => ()
      }
    }
  }
}
