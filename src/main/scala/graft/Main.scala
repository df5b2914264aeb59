package graft

import graft.pipeline.{ExtractionPipeline, Snapshot}
import graft.sources.DocSources
import org.apache.spark.sql.SparkSession

/** spark-submit entry point for the extraction job:
  *
  * {{{
  * spark-submit --class graft.Main ocrdeploymentspark.jar \
  *   extract    --in <docs.parquet> --out <dir> [--partitions P] [--salt S] \
  *              [--mode prompt_layout_all_en] [--split-oversized] \
  *   resumable  --in <docs.parquet> --out <dir> [--buckets B] [--per-commit K]
  *   stream     --in <dir> --out <dir> --checkpoint <dir>
  *   synth      --out <dir> --docs N
  * }}}
  *
  * On a cluster the session comes from spark-submit (master/executors from
  * the submit conf); `local[32]` is only the sandbox fallback.
  */
object Main {

  private def arg(args: Array[String], key: String): Option[String] = {
    val i = args.indexOf(s"--$key")
    if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
  }
  private def flag(args: Array[String], key: String): Boolean =
    args.contains(s"--$key")

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "subcommand required: extract|resumable|stream|synth")
    val spark = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .master(sys.props.getOrElse("spark.master",
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = ExtractionPipeline.Config(
      numPartitions = arg(args, "partitions").map(_.toInt)
        .getOrElse(spark.sparkContext.defaultParallelism * 4),
      salt = arg(args, "salt").map(_.toInt).getOrElse(0),
      mode = arg(args, "mode").getOrElse(graft.kernel.Router.LayoutAll),
      splitOversized = flag(args, "split-oversized"))

    def req(name: String): String = arg(args, name).getOrElse(
      sys.error(s"missing required flag --$name for subcommand ${args(0)}"))
    args(0) match {
      case "extract" =>
        val in = req("in")
        val out = req("out")
        val results = ExtractionPipeline.extract(DocSources.readDocs(spark, in), cfg)
        DocSources.writeResults(results, out)
        // re-read for metrics (results would otherwise recompute); the
        // partition dir column comes back as STRING, so cast it
        ExtractionPipeline.partitionMetrics(
            spark.read.parquet(out).selectExpr("doc_id", "spans",
              "cast(success as boolean) as success",
              "failure_code", "n_spans", "n_pages", "partition_id", "kernel_nanos")
              .as[graft.model.DocResult](org.apache.spark.sql.Encoders.product),
            snapshotId = 0)
          .write.mode("overwrite").parquet(s"$out/_metrics")
      case "resumable" =>
        val report = Snapshot.run(
          DocSources.readDocs(spark, arg(args, "in").get),
          arg(args, "out").get, cfg,
          nBuckets = arg(args, "buckets").map(_.toInt).getOrElse(64),
          bucketsPerCommit = arg(args, "per-commit").map(_.toInt).getOrElse(8))
        println(s"resumable run: ran=${report.bucketsRun.mkString(",")} " +
          s"skipped=${report.bucketsSkipped.mkString(",")}")
      case "stream" =>
        graft.streaming.StreamingExtract.run(spark, arg(args, "in").get,
          arg(args, "out").get, arg(args, "checkpoint").get, cfg.mode)
          .awaitTermination()
      case "synth" =>
        ExtractionPipeline.synthDocs(spark, arg(args, "docs").map(_.toLong).getOrElse(100000L),
            parallelism = cfg.numPartitions)
          .write.mode("overwrite").parquet(arg(args, "out").get)
      case other => sys.error(s"unknown subcommand $other")
    }
    spark.stop()
  }
}
