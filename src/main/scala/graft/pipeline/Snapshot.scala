package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper
import graft.model.{Doc, DocResult}
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Snapshot-manifest checkpointing: resumable extraction runs with
  * per-bucket lineage (north rule: "resumable from checkpoint, snapshot
  * based, per-partition lineage + metrics").
  *
  * No Iceberg runtime ships in this sandbox, so snapshot semantics are
  * realized the way Iceberg realizes them internally: immutable data files
  * plus an atomically-committed JSON manifest listing completed work units.
  * The commit unit is a **doc_id hash bucket** (`pmod(hash(doc_id), B)`):
  *  - output parquet is written under `data/bucket=<b>/` per bucket group;
  *  - after each group commits, `_snapshot/manifest-<k>.json` records the
  *    completed buckets with lineage (docs/pages/spans/failures/wall_ms);
  *  - manifests are written to a temp file and atomically renamed — a
  *    killed run leaves either a complete manifest or none;
  *  - resume = read manifests, skip completed buckets; re-running a
  *    partially-written bucket overwrites its directory (idempotent).
  * At warehouse scale the input table would itself be bucketed by
  * `bucket(doc_id)` so each group prunes at the storage layer; here the
  * filter is evaluated on the scan (documented tradeoff).
  *
  * The reference has no resumability (re-runs start over); this is the
  * Spark-native upgrade demanded by the north rule (SURVEY.md §2.9).
  */
object Snapshot {

  private val mapper = new ObjectMapper()

  final case class BucketLineage(
      bucket: Int, n_docs: Long, n_pages: Long, n_spans: Long,
      n_failures: Long, wall_ms: Long)

  def manifestDir(outDir: String): Path = Paths.get(outDir, "_snapshot")

  /** List manifest files, closing the directory stream (Files.list leaks
    * an fd per call otherwise). */
  private def manifestFiles(outDir: String): Seq[Path] = {
    val dir = manifestDir(outDir)
    if (!Files.isDirectory(dir)) return Seq.empty
    val stream = Files.list(dir)
    try stream.iterator().asScala
      .filter(_.getFileName.toString.matches("manifest-\\d+\\.json")).toSeq
    finally stream.close()
  }

  def completedBuckets(outDir: String): Set[Int] =
    manifestFiles(outDir).flatMap { p =>
      val root = mapper.readTree(Files.readAllBytes(p))
      root.get("buckets").elements().asScala.map(_.get("bucket").asInt())
    }.toSet

  private def nextManifestId(outDir: String): Int = {
    val ids = manifestFiles(outDir).map(_.getFileName.toString)
      .map(_.stripPrefix("manifest-").stripSuffix(".json").toInt)
    if (ids.isEmpty) 0 else ids.max + 1
  }

  private def commitManifest(outDir: String, snapshotId: Long,
                             lineage: Seq[BucketLineage]): Unit = {
    val dir = manifestDir(outDir)
    Files.createDirectories(dir)
    val node = mapper.createObjectNode()
    node.put("snapshot_id", snapshotId)
    val arr = node.putArray("buckets")
    lineage.foreach { l =>
      val b = arr.addObject()
      b.put("bucket", l.bucket); b.put("n_docs", l.n_docs)
      b.put("n_pages", l.n_pages); b.put("n_spans", l.n_spans)
      b.put("n_failures", l.n_failures); b.put("wall_ms", l.wall_ms)
    }
    val tmp = dir.resolve(s".manifest-$snapshotId.tmp")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(node).getBytes(StandardCharsets.UTF_8))
    // atomic rename = the commit point
    Files.move(tmp, dir.resolve(s"manifest-$snapshotId.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  final case class RunReport(bucketsRun: Seq[Int], bucketsSkipped: Seq[Int])

  /** Run (or resume) a snapshot-checkpointed extraction over `docs`.
    *
    * @param nBuckets         commit granularity (hash buckets of doc_id)
    * @param bucketsPerCommit buckets processed per snapshot commit
    * @param maxCommits       stop after this many commits (for testing
    *                         kill/resume; <0 = run to completion)
    */
  def run(docs: Dataset[Doc], outDir: String,
          cfg: ExtractionPipeline.Config = ExtractionPipeline.Config(),
          nBuckets: Int = 16, bucketsPerCommit: Int = 4,
          maxCommits: Int = -1): RunReport = {
    val spark = docs.sparkSession
    import spark.implicits._
    val done = completedBuckets(outDir)
    val todo = (0 until nBuckets).filterNot(done.contains)
    val groups = todo.grouped(bucketsPerCommit).toSeq
    val limited = if (maxCommits >= 0) groups.take(maxCommits) else groups
    var snapshotId = nextManifestId(outDir).toLong
    limited.foreach { bs =>
      val subset = docs
        .filter(pmod(hash($"doc_id"), lit(nBuckets)).isin(bs.map(Integer.valueOf): _*))
        .as[Doc]
      val results = ExtractionPipeline.extract(subset, cfg)
        .withColumn("bucket", pmod(hash($"doc_id"), lit(nBuckets)))
      results.write.mode(SaveMode.Overwrite)
        .partitionBy("bucket")
        .parquet(s"$outDir/data/snapshot=$snapshotId")
      // lineage per bucket from the written data (one action, small agg)
      val lineage = spark.read.parquet(s"$outDir/data/snapshot=$snapshotId")
        .groupBy("bucket")
        .agg(count("*").as("n_docs"), sum("n_pages").as("n_pages"),
          sum("n_spans").as("n_spans"),
          sum(when(not($"success"), 1L).otherwise(0L)).as("n_failures"),
          sum($"kernel_nanos" / 1000000L).as("wall_ms"))
        .collect()
        .map(r => BucketLineage(r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5).toLong))
        .toSeq
      commitManifest(outDir, snapshotId, lineage)
      snapshotId += 1
    }
    RunReport(limited.flatten, done.toSeq.sorted)
  }

  /** Read back all committed results: visibility comes from the manifest
    * log, never from what happens to sit in the data directory — a crash
    * between the parquet write and the manifest commit leaves an orphaned
    * `snapshot=K` dir that no reader must see (run() overwrites it on
    * retry). Realized as readAt of the latest committed id. */
  def readResults(spark: SparkSession, outDir: String): Dataset[DocResult] =
    readAt(spark, outDir, snapshots(outDir).lastOption.map(_._1).getOrElse(-1L))

  /** Iceberg-style time travel: the table as of snapshot `snapshotId`
    * (inclusive). Visibility is defined by the immutable manifest log —
    * later commits simply don't exist for this reader. The filter is on the
    * `snapshot=` partition directory, so pruning happens at the file
    * listing, never by scanning newer data. */
  def readAt(spark: SparkSession, outDir: String, snapshotId: Long): Dataset[DocResult] = {
    import spark.implicits._
    // only manifest-committed ids are visible — an isin() on the committed
    // set (not `<= id`) so orphaned data dirs from a crash between the
    // parquet write and the manifest commit never leak into a read; the
    // filter stays on the partition column (pruned at file listing)
    val committed = snapshots(outDir).map(_._1).filter(_ <= snapshotId)
    if (committed.isEmpty) return spark.emptyDataset[DocResult]
    spark.read.parquet(s"$outDir/data")
      .filter(col("snapshot").isin(committed: _*))
      .select("doc_id", "spans", "success", "failure_code", "n_spans",
        "n_pages", "partition_id", "kernel_nanos")
      .as[DocResult]
  }

  /** The manifest log: committed snapshot ids (ascending) with their
    * per-bucket lineage — the audit surface for time travel and resume. */
  def snapshots(outDir: String): Seq[(Long, Seq[BucketLineage])] = {
    manifestFiles(outDir).iterator
      .map { p =>
        val root = mapper.readTree(Files.readAllBytes(p))
        val id = root.get("snapshot_id").asLong()
        val lineage = root.get("buckets").elements().asScala.map { b =>
          BucketLineage(b.get("bucket").asInt(), b.get("n_docs").asLong(),
            b.get("n_pages").asLong(), b.get("n_spans").asLong(),
            b.get("n_failures").asLong(), b.get("wall_ms").asLong())
        }.toSeq
        (id, lineage)
      }.toSeq.sortBy(_._1)
  }
}
