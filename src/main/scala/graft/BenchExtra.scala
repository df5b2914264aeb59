package graft

import org.apache.spark.sql.functions._

/** Extra (non-contract) measurement mains for optimization rounds — the
  * guide §1.4 noop-sink isolation harness. NOT part of the driver's bench
  * contract (`graft.Bench` is frozen); numbers from here are cited in
  * OPTIMIZATION_r*.md only.
  *
  * Usage:
  *   graft.BenchExtra iso <sfDir> <n> <query>[,<query>...]
  *     — run each named SparkEntry query n times through the noop sink,
  *       print per-run seconds (same session config as the bench battery).
  *   graft.BenchExtra explain <sfDir> <outDir> <query>[,...]
  *     — write `.explain("formatted")` for each query to <outDir>/<query>.txt
  *   graft.BenchExtra jobs <sfDir> <query>
  *     — run the query once with a job listener, print per-job wall times
  *       and descriptions (where the d8-style multi-job queries spend).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val sfDir = args(1)
    val spark = Bench.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, s"graft-extra-$mode")

    mode match {
      case "iso" =>
        val n = args(2).toInt
        val names = args(3).split(',').toSeq
        // same battery warmup as Bench phase 2
        spark.range(1000000L).selectExpr("count(distinct id)").collect()
        spark.read.parquet(s"$sfDir/documents.parquet")
          .selectExpr("count(md5(text))").collect()
        names.foreach { name =>
          (1 to n).foreach { i =>
            val t0 = System.nanoTime()
            SparkEntry.queries(name)(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
            println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
          }
        }
      case "explain" =>
        val outDir = args(2)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        args(3).split(',').foreach { name =>
          val df = SparkEntry.queries(name)(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"$name.txt"),
            txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"wrote $outDir/$name.txt")
        }
      case "explain-final" =>
        // execute through the noop sink first, then print the FINAL
        // adaptive plan — AQE's runtime exchange/stage reuse (ReusedExchange,
        // ReusedQueryStage) is invisible in the pre-execution plan
        val outDir = args(2)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        args(3).split(',').foreach { name =>
          val df = SparkEntry.queries(name)(spark, sfDir)
          // drain THIS QueryExecution's plan (a .write would clone it and
          // the clone's final plan is not visible on df)
          df.queryExecution.executedPlan.execute()
            .foreachPartition((it: Iterator[_]) => it.foreach(_ => ()))
          val txt = "== Final adaptive plan (after execution) ==\n" +
            df.queryExecution.executedPlan.toString
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"$name.final.txt"),
            txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"wrote $outDir/$name.final.txt")
        }
      case "jobs" =>
        val name = args(2)
        val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        val done = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, String)]
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(
                js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
              jobs.put(js.jobId, (System.nanoTime(),
                Option(js.properties.getProperty("spark.job.description"))
                  .getOrElse("")))
            override def onJobEnd(
                je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
              Option(jobs.get(je.jobId)).foreach { case (t0, d) =>
                done.synchronized {
                  done += ((je.jobId, (System.nanoTime() - t0) / 1e9, d)): Unit
                }
              }
            }
          })
        // warmup pass (codegen) then measured pass
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        // listener events ride an async bus: give the warmup's trailing
        // onJobEnd events time to land before clearing, or they pollute
        // the measured table
        Thread.sleep(500)
        done.synchronized(done.clear())
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        done.synchronized {
          done.sortBy(_._1).foreach { case (id, sec, d) =>
            println(f"job $id%3d ${sec}%7.3f s  $d")
          }
          println(f"jobs=${done.size} jobSecSum=${done.map(_._2).sum}%.3f wall=$wall%.3f")
        }
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
