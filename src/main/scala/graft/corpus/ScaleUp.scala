package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 10× (or F×) scale-up of a driver testdata directory, for
  * scale-confidence battery runs (BASELINE.md sf1 note). NOT a correctness
  * input — the driver's own sf dirs stay the oracle surface; this exists to
  * show the capped/iterative operators (d2's shingle self-join, d7's
  * clustering) stay bounded at 10× corpus.
  *
  * Fact tables replicate F× with key strides so joins stay consistent
  * (the same stride applies to a key on every side); dimension tables
  * (region, nation) keep their cardinality, as dims do at scale. Replica 0
  * is the original data byte-for-byte, so id-filtered query sides
  * (vec_id < 8, doc_id < 40) keep their rows. Document texts of replicas
  * k>0 are word-permuted with a (doc_id, k)-seeded Fisher-Yates — same
  * length/token distributions, but no shared shingles, so near-dup
  * populations scale ~linearly instead of exploding quadratically across
  * identical copies. Embeddings of replicas k>0 get seeded component noise
  * for the same reason.
  *
  * Run: graft.ScaleUpMain <srcDir> <dstDir> [factor]
  */
object ScaleUp {

  private val Stride = 100000000L

  private def reps(spark: SparkSession, factor: Int) =
    spark.range(factor).select(col("id").cast("int").as("rep"))

  private def replicate(df: DataFrame, factor: Int,
                        keyCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val crossed = df.crossJoin(broadcast(reps(spark, factor)))
    keyCols.foldLeft(crossed) { (d, k) =>
      d.withColumn(k, col(k) + col("rep") * Stride)
    }
  }

  private val permuteText = udf { (docId: Long, rep: Int, text: String) =>
    if (rep == 0 || text == null) text
    else {
      val words = text.split("\\s+").filter(_.nonEmpty)
      val r = new Synth.Rng(Synth.splitmix64(docId * 1000003L + rep))
      var i = words.length - 1
      while (i > 0) {
        val j = r.nextInt(i + 1)
        val t = words(i); words(i) = words(j); words(j) = t
        i -= 1
      }
      words.mkString(" ")
    }
  }

  private val perturbEmbedding = udf { (vecId: Long, rep: Int, emb: Seq[Float]) =>
    if (rep == 0 || emb == null) emb
    else {
      val r = new Synth.Rng(Synth.splitmix64(vecId * 7919L + rep))
      emb.map(x => x + (r.nextDouble().toFloat - 0.5f) * 0.2f)
    }
  }

  def run(spark: SparkSession, srcDir: String, dstDir: String,
          factor: Int = 10): Unit = {
    def rd(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    def wr(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dstDir/$t.parquet")

    // dimensions: cardinality fixed at scale
    wr(rd("region"), "region")
    wr(rd("nation"), "nation")

    wr(replicate(rd("customer"), factor, Seq("c_custkey")).drop("rep"), "customer")
    wr(replicate(rd("supplier"), factor, Seq("s_suppkey")).drop("rep"), "supplier")
    wr(replicate(rd("part"), factor, Seq("p_partkey")).drop("rep"), "part")
    wr(replicate(rd("orders"), factor, Seq("o_orderkey", "o_custkey")).drop("rep"), "orders")
    wr(replicate(rd("lineitem"), factor,
      Seq("l_orderkey", "l_partkey", "l_suppkey")).drop("rep"), "lineitem")
    wr(replicate(rd("events"), factor, Seq("event_id", "user_id")).drop("rep"), "events")
    wr(replicate(rd("documents"), factor, Seq("doc_id"))
      .withColumn("text", permuteText(col("doc_id"), col("rep"), col("text")))
      .drop("rep"), "documents")
    wr(replicate(rd("embeddings"), factor, Seq("vec_id"))
      .withColumn("embedding",
        perturbEmbedding(col("vec_id"), col("rep"), col("embedding")))
      .drop("rep"), "embeddings")
  }
}

object ScaleUpMain {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = graft.Bench.session(32, "graft-scaleup")
    ScaleUp.run(spark, src, dst, factor)
    spark.stop()
  }
}
