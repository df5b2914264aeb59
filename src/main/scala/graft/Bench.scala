package graft

import graft.pipeline.ExtractionPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark driver. Two phases, one JSON line on stdout:
  *
  *  1. **Scaling** (BASELINE.json contract): the identical extraction job —
  *     same materialized parquet corpus, same partition count — at
  *     `local[N]` and `local[4N]` (default N=2: see the DRAM-ceiling note
  *     in BASELINE.md), each level in its OWN child JVM
  *     with `-XX:ActiveProcessorCount=N` so GC/JIT/common-pool threads are
  *     sized to the simulated core count (otherwise the JVM quietly uses
  *     all 32 host cores for GC and the levels are not comparable).
  *     Per level: 2 full warmup runs (C2 compilation), then best-of-5 timed
  *     runs (SPARK_GRAFT_BENCH_PASSES). Efficiency = (tp@4N / tp@N) / 4,
  *     target ≥ 0.8.
  *  2. **Headline queries**: every SparkEntry query against
  *     $SPARK_GRAFT_SF_DIR at local[$SPARK_GRAFT_CPUS], forced through the
  *     noop sink so projections/joins actually execute.
  */
object Bench {

  private[graft] def session(cpus: Int, app: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(app)
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.sql.shuffle.partitions", math.max(cpus, 32).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.cleaner.periodicGC.interval", "20s")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** JDK17 module opens required by Spark outside spark-submit (same list
    * as build.sbt / org.apache.spark.launcher.JavaModuleOptions). */
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Spawn one scaling level in a child JVM; returns its one-line JSON.
    *
    * The JVM is hard-pinned to exactly `level` host cores with
    * `taskset -c 0-(level-1)` when available. `-XX:ActiveProcessorCount`
    * alone only *sizes* thread pools — it does not stop the "2-core" JVM's
    * GC/JIT/OS threads from borrowing the 30 idle host cores, which
    * inflates low-level throughput by ~8% (measured) and understates the
    * scaling ratio. Pinning makes each level a faithful N-core machine. */
  private def runLevel(level: Int, corpus: String, parts: Int,
                       fusedArg: Long): Map[String, Double] = {
    val java = s"${System.getProperty("java.home")}/bin/java"
    // resolve taskset from PATH, not a hardcoded location — silently
    // unpinned levels would quietly inflate the low-level throughput ~8%
    val tasksetBin = (sys.env.getOrElse("PATH", "").split(':').toSeq :+ "/usr/bin")
      .map(dir => new _root_.java.io.File(dir, "taskset"))
      .find(_.canExecute).map(_.getAbsolutePath)
    if (tasksetBin.isEmpty)
      System.err.println("[bench] WARNING: taskset not found — levels run " +
        "UNPINNED; scaling efficiency will be overstated on idle hosts")
    val taskset = tasksetBin.toSeq.flatMap(t => Seq(t, "-c", s"0-${level - 1}"))
    val cmd = taskset ++ Seq(java, s"-XX:ActiveProcessorCount=$level",
      s"-Xmx${sys.env.getOrElse("SPARK_GRAFT_WORKER_MEM", "48g")}",
      "-XX:G1HeapRegionSize=32m", // monster docs allocate multi-MB arrays;
      // bigger regions keep them out of the humongous-fragmentation path
      "-Dspark.ui.enabled=false") ++ addOpens ++ Seq(
      "-cp", System.getProperty("java.class.path"),
      "graft.BenchWorker", level.toString, corpus, parts.toString, fusedArg.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes())
    val code = proc.waitFor()
    val line = out.linesIterator.filter(_.startsWith("BENCH_LEVEL ")).toSeq.lastOption
    require(code == 0 && line.isDefined, s"level $level failed (exit $code)")
    // "BENCH_LEVEL k=v k=v ..."
    line.get.stripPrefix("BENCH_LEVEL ").split("\\s+")
      .map { kv => val Array(k, v) = kv.split("=", 2); k -> v.toDouble }.toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // Default pair N=2 vs 4N=8: on this single 32-core box the extraction
    // workload saturates DRAM bandwidth above ~8-16 cores (string-heavy
    // kernel), so 8→32 measures the memory bus, not the engine; 2→8 stays
    // in the CPU-bound regime a real multi-node cluster would see at any
    // size. Both pairs are reported in BASELINE.md.
    val nLo = sys.env.getOrElse("SPARK_GRAFT_N_LO", "2").toInt
    val nHi = sys.env.getOrElse("SPARK_GRAFT_N_HI", "8").toInt
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "300000").toLong
    // task granularity: nHi*8 tasks (8 waves at the high level) — big
    // enough tasks that the single-threaded DAGScheduler dispatch loop
    // stays off the critical path (512 micro-tasks cost ~1-2s of pure
    // driver time), small enough that stragglers level out
    val parts = sys.env.getOrElse("SPARK_GRAFT_BENCH_PARTS", (nHi * 8).toString).toInt

    // materialize the corpus once (both levels read identical bytes);
    // fused mode (default) generates in-pipeline instead and needs no files
    val fused = sys.env.get("SPARK_GRAFT_BENCH_FUSED").forall(_ != "0")
    val corpus = s"/tmp/graft_bench_corpus_$benchDocs"
    if (!fused &&
        !java.nio.file.Files.exists(java.nio.file.Paths.get(corpus, "_SUCCESS"))) {
      val s = session(32, "graft-bench-gen")
      ExtractionPipeline.synthDocs(s, benchDocs, parallelism = parts)
        .write.mode("overwrite").parquet(corpus)
      s.stop()
    }

    val fusedArg = if (fused) benchDocs else 0L
    val lo = runLevel(nLo, corpus, parts, fusedArg)
    val hi = runLevel(nHi, corpus, parts, fusedArg)
    val tpLo = lo("pages_per_sec")
    val tpHi = hi("pages_per_sec")
    val eff = (tpHi / tpLo) / (nHi.toDouble / nLo)
    // median-based efficiency: same ratio over median-of-k walls — the
    // robustness companion to the best-of-k headline (one noisy pass at
    // either level moves best-of by at most that pass; median by nothing)
    val effMedian =
      (hi("pages_per_sec_median") / lo("pages_per_sec_median")) / (nHi.toDouble / nLo)

    // ---- phase 2: headline queries on the sf dir ----
    val spark = session(cpus, "graft-bench-queries")
    // untimed session warmup: without it the alphabetically-first query
    // (d1) absorbs all one-time costs — codegen compiler init, first-job
    // scheduler paths, parquet footer reads — and reads ~6s for a 0.5s
    // aggregation. Steady-state per-query numbers are the useful ones.
    // warmup failures must not abort the whole bench (a bad sf dir already
    // marks individual queries -1.0 below; the warmup is best-effort)
    try {
      spark.range(1000000L).selectExpr("count(distinct id)").collect()
      spark.read.parquet(s"$sfDir/documents.parquet")
        .selectExpr("count(md5(text))").collect()
      // compile the expression palette the first queries use (higher-order
      // filters, big CASE chains, semi-join codegen) on a tiny slice —
      // otherwise whichever query sorts first absorbs ~5-7s of one-time
      // codegen that misreads as operator cost
      val w = spark.read.parquet(s"$sfDir/documents.parquet").limit(256)
        .select(col("doc_id"),
          graft.ops.TextAnalysis.qualityLabelCol(col("text")).as("q"),
          graft.ops.TextAnalysis.langIdCol(col("text")).as("l"),
          md5(col("text").cast("binary")).as("h"))
      w.join(w.groupBy("h").agg(min("doc_id").as("doc_id")),
        Seq("doc_id"), "left_semi").count()
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] warmup failed (continuing): ${e.getMessage}")
    }
    // two passes, best-of-2 per query: pass 1 pays each query's one-time
    // Janino/JIT compilation of its generated stages (~6s for the largest
    // plans — a per-plan cost no generic warmup can precompile), pass 2 is
    // the steady-state number an analytics deployment sees. queryWall
    // accumulates both passes (including failed attempts).
    val queryTimes = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    var queryWall = 0.0
    (1 to 2).foreach { _ =>
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          queryWall += sec
          // best valid time wins; a success always displaces an earlier
          // failure marker (and a later failure never erases a valid time)
          queryTimes(name) =
            math.min(queryTimes.get(name).filter(_ >= 0).getOrElse(Double.MaxValue), sec)
        } catch {
          case e: Throwable =>
            queryWall += (System.nanoTime() - t0) / 1e9 // failed time is still spent
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            if (!queryTimes.get(name).exists(_ >= 0)) queryTimes(name) = -1.0
        }
      }
    }
    spark.stop()

    def f(d: Double) = "%.4f".format(d)
    val extras = Seq(
      s""""extract_wall_sec_n$nLo":${f(lo("wall_sec"))}""",
      s""""extract_wall_sec_n$nHi":${f(hi("wall_sec"))}""",
      s""""pages_per_sec_n$nLo":${f(tpLo)}""",
      s""""pages_per_sec_n$nHi":${f(tpHi)}""",
      s""""docs_per_sec_n$nLo":${f(lo("docs_per_sec"))}""",
      s""""docs_per_sec_n$nHi":${f(hi("docs_per_sec"))}""",
      s""""spans_per_sec_n$nHi":${f(hi("spans_per_sec"))}""",
      s""""scaling_efficiency":${f(eff)}""",
      s""""scaling_efficiency_median":${f(effMedian)}""",
      s""""median_wall_sec_n$nLo":${f(lo("median_wall_sec"))}""",
      s""""median_wall_sec_n$nHi":${f(hi("median_wall_sec"))}""",
      s""""bench_docs":${benchDocs}""",
      s""""bench_pages":${hi("pages").toLong}""")
    val qs = (queryTimes.map { case (k, v) => s""""$k":${f(v)}""" } ++ extras)
      .mkString("{", ",", "}")
    val total = queryWall + lo("total_sec") + hi("total_sec")
    println(s"""{"metric":"pages_per_sec@N=$nHi","value":${f(tpHi)},"unit":"pages/sec","total_sec":${f(total)},"queries":$qs,"sf":"$sfDir"}""")
  }
}

/** Child-JVM worker: one scaling level, warmups then best-of-k timing. */
object BenchWorker {
  def main(args: Array[String]): Unit = {
    val Array(levelS, corpus, partsS, fusedS) = args
    val level = levelS.toInt
    val parts = partsS.toInt
    val fusedDocs = Option(fusedS.toLong).filter(_ > 0)
    val spark = Bench.session(level, s"graft-bench-l$level")
    import spark.implicits._

    def onePass(): (Double, Long, Long, Long) = {
      val docs = fusedDocs match {
        case Some(n) => ExtractionPipeline.synthDocs(spark, n, parallelism = parts)
        case None    => spark.read.parquet(corpus).as[graft.model.Doc]
      }
      val t0 = System.nanoTime()
      val row = ExtractionPipeline.extract(docs,
        ExtractionPipeline.Config(numPartitions = parts))
        .agg(count(lit(1)), sum("n_pages"), sum("n_spans"))
        .collect()(0)
      ((System.nanoTime() - t0) / 1e9, row.getLong(0), row.getLong(1), row.getLong(2))
    }

    val tTotal0 = System.nanoTime()
    if (sys.env.contains("SPARK_GRAFT_BENCH_DEBUG")) {
      // stage-cost breakdown: scan-only, scan+shuffle, full pipeline
      def scanOnly(): Double = {
        val t0 = System.nanoTime()
        spark.read.parquet(corpus).agg(count(lit(1)), sum(size(col("spans")))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      def scanShuffle(): Double = {
        val docs = spark.read.parquet(corpus).as[graft.model.Doc]
        val t0 = System.nanoTime()
        docs.repartition(parts, pmod(hash(col("doc_id")), lit(parts))).as[graft.model.Doc]
          .mapPartitions(it => Iterator.single(it.size))
          .agg(sum(col("value"))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      (1 to 2).foreach { i =>
        System.err.println(f"DEBUG pass$i scan=${scanOnly()}%.2f scanShuffle=${scanShuffle()}%.2f full=${onePass()._1}%.2f")
      }
    }
    def gcPause(): Unit = { System.gc(); Thread.sleep(300) }
    onePass(); gcPause(); onePass(); gcPause() // warmup (C2)
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "5").toInt
    val timed = (1 to passes).map { _ => val r = onePass(); gcPause(); r }
    System.err.println(s"DEBUG timed walls: ${timed.map(t => f"${t._1}%.2f").mkString(", ")}")
    // best-of-k: peak sustained throughput, robust to GC/host noise in a
    // shared sandbox (each pass is a full multi-hundred-k-doc job, not a
    // microbench); both levels together run ~3.5 min, whole bench ~6 min.
    // The median wall is reported alongside: best-of is the headline (noise
    // can only slow a pass, never speed it), median shows the efficiency
    // number is not riding on one lucky pass.
    val best = timed.minBy(_._1)
    val (wall, nDocs, nPages, nSpans) = best
    val walls = timed.map(_._1).sorted
    val medianWall = walls(walls.length / 2)
    val totalSec = (System.nanoTime() - tTotal0) / 1e9
    println(s"BENCH_LEVEL wall_sec=$wall median_wall_sec=$medianWall " +
      s"pages=$nPages docs=$nDocs spans=$nSpans " +
      s"pages_per_sec=${nPages / wall} docs_per_sec=${nDocs / wall} " +
      s"pages_per_sec_median=${nPages / medianWall} " +
      s"spans_per_sec=${nSpans / wall} total_sec=$totalSec")
    spark.stop()
  }
}
