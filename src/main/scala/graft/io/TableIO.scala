package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Catalog-shaped table layer (SURVEY.md §7.1). The target deployment is
  * Iceberg (`spark.read.table` / `writeTo(...).createOrReplace`); this
  * sandbox ships no Iceberg runtime jar, so [[ParquetTableIO]] provides the
  * identical contract over parquet paths. Engine code only ever sees the
  * trait, so swapping the connector is a one-line session change.
  */
trait TableIO extends Serializable {
  def read(spark: SparkSession, table: String): DataFrame
  def write(df: DataFrame, table: String): Unit
  def append(df: DataFrame, table: String): Unit
  def exists(spark: SparkSession, table: String): Boolean

  /** Row count of a persisted table for lineage/metrics. Default is a
    * count() job; connectors override with a metadata-only path (parquet
    * footers, Iceberg snapshot summaries) so lineage never re-scans the
    * data a stage just wrote. */
  def rowCount(spark: SparkSession, table: String): Long =
    read(spark, table).count()

  /** Idempotent micro-batch append: replaying batch `batchId` (after a
    * crash between per-table appends) overwrites exactly its own rows
    * instead of duplicating them — the table is partitioned by `_batch_id`
    * and the write is a dynamic partition overwrite, so re-running a batch
    * is a no-op at the table layer. */
  def appendBatch(df: DataFrame, table: String, batchId: Long): Unit
}

class ParquetTableIO(base: String) extends TableIO {
  private def path(table: String) = s"$base/$table"
  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(path(table))
  override def write(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path(table))
  override def append(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path(table))
  override def exists(spark: SparkSession, table: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(table), "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
  override def appendBatch(df: DataFrame, table: String, batchId: Long): Unit =
    df.withColumn("_batch_id", org.apache.spark.sql.functions.lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch_id")
      .parquet(path(table))

  /** Metadata-only count: sums the row counts in each part-file's parquet
    * FOOTER (a few KB of trailer bytes per file, read on the driver) —
    * no Spark job, no data scan. Iceberg's equivalent reads the snapshot
    * summary; this is the parquet-path analog. The listing is RECURSIVE:
    * [[appendBatch]] tables nest their part files under `_batch_id=N/`
    * partition directories, which a flat listing would silently count
    * as 0 — masking exactly the data loss lineage exists to catch. */
  override def rowCount(spark: SparkSession, table: String): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(path(table))
    val fs = dir.getFileSystem(conf)
    val it = fs.listFiles(dir, true)
    var total = 0L
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.endsWith(".parquet")) {
        val r = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
        total += (try r.getRecordCount finally r.close())
      }
    }
    total
  }
}

/** When an Iceberg catalog is on the session, the same contract routes
  * through the catalog (table names like `db.nodes`). */
class CatalogTableIO(db: String) extends TableIO {
  private def name(table: String) = s"$db.$table"
  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.table(name(table))
  override def write(df: DataFrame, table: String): Unit =
    df.writeTo(name(table)).createOrReplace()
  override def append(df: DataFrame, table: String): Unit =
    df.writeTo(name(table)).append()
  override def exists(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(name(table))
  override def appendBatch(df: DataFrame, table: String, batchId: Long): Unit = {
    val stamped = df.withColumn("_batch_id", org.apache.spark.sql.functions.lit(batchId))
    if (!exists(stamped.sparkSession, table))
      stamped.writeTo(name(table))
        .partitionedBy(org.apache.spark.sql.functions.col("_batch_id"))
        .createOrReplace()
    else stamped.writeTo(name(table)).overwritePartitions()
  }

  /** Metadata-only count on the catalog path: Iceberg's `<table>.files`
    * metadata table carries a per-data-file `record_count`, so lineage
    * never re-scans the stage output it just wrote (the trait default
    * count() would — the exact per-stage re-scan Checkpoints forbids).
    * Falls back to a count() for catalogs without the metadata table. */
  override def rowCount(spark: SparkSession, table: String): Long =
    // content = 0 restricts to DATA files: on a format-v2 table `.files`
    // also lists position/equality delete files whose record_count is the
    // number of DELETED rows — summing those would overcount and mask the
    // exact data-loss signal this lineage column exists to catch
    try spark.sql(s"SELECT coalesce(sum(record_count), 0) FROM ${name(table)}.files" +
        " WHERE content = 0")
      .head().getLong(0)
    catch { case _: Exception => read(spark, table).count() }
}

/** Per-stage checkpoint + lineage/metrics (replaces the reference's mutable
  * ChangeLog, eschergraph/persistence/change_log.py:12-31, with append-only
  * run metadata — the resumability story of BASELINE.json north_rule).
  *
  * `stage(name)(compute)`: if the stage output table exists, read it (the
  * resume path — lineage notes a cache hit); otherwise compute, write,
  * append a lineage row (run_id, stage, rows, wall_ms, resumed) and read
  * back, so downstream stages always consume the persisted artifact and a
  * killed build restarts exactly after its last completed stage.
  */
class Checkpoints(spark: SparkSession, io: TableIO, runId: String) {
  import spark.implicits._

  /** Stages materialize concurrently (BuildPipeline overlaps independent
    * stages), but `_lineage` is ONE table: concurrent parquet appends to
    * the same path race on the commit protocol, so only the lineage append
    * is serialized — the per-stage data writes go to distinct dirs and run
    * fully parallel. */
  private val lineageLock = new Object

  def stage(name: String)(compute: => DataFrame): DataFrame = {
    val t0 = System.nanoTime()
    val resumed = io.exists(spark, name)
    if (!resumed) {
      io.write(compute, name)
    }
    val out = io.read(spark, name)
    // metadata-only for parquet/Iceberg — lineage must not re-scan the
    // stage output it just wrote (VERDICT r2: one extra count() job per
    // stage was visible in every build's job timeline)
    val rows = io.rowCount(spark, name)
    val wallMs = (System.nanoTime() - t0) / 1000000L
    val lineage = Seq((runId, name, rows, wallMs, resumed))
      .toDF("run_id", "stage", "rows_out", "wall_ms", "resumed")
    lineageLock.synchronized { io.append(lineage, "_lineage") }
    out
  }
}
