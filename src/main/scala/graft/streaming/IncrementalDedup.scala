package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental near-duplicate detection — the nightly-curation shape.
  *
  * Each run MinHashes ONLY the newly-arrived documents and LSH-joins their
  * banded signatures against the committed signature store, so per-run work
  * is O(new docs × store selectivity), never a re-hash of the corpus. The
  * file source + `Trigger.AvailableNow` + checkpoint make every drop
  * process exactly once (same contract as [[StreamingExtract.run]]); the
  * per-batch outputs land in `batch=<id>` partition directories, so a
  * replayed micro-batch overwrites its own partition instead of
  * double-appending (idempotent under foreachBatch's at-least-once).
  *
  * Completeness argument (incremental ≡ batch, tested in StreamingSpec):
  * a batch pair (a,b) shares ≥1 band key; let b arrive in the later (or
  * same) drop as a. When b's drop runs, a's signature is either in the
  * store (cross join finds the pair) or in the same drop (the in-drop
  * self-join finds it) — and only that run emits it, so the union of
  * per-run outputs has no cross-run duplicates. Signatures are per-doc
  * pure functions, so incremental signatures equal batch signatures.
  *
  * Assumes doc_ids are unique across drops (re-delivered doc_ids would
  * pair with themselves in the store). At 100 TB the store would hold the
  * banded KEYS too (here they are recomputed from the stored signatures —
  * 16 column expressions per run — to keep the store minimal).
  */
object IncrementalDedup {

  /** Start (or resume) incremental dedup: new parquet doc files under
    * `inDir` → near-dup pairs appended under `pairsDir/batch=N` and
    * signatures committed under `storeDir/batch=N`. */
  def run(spark: SparkSession, inDir: String, storeDir: String,
          pairsDir: String, checkpointDir: String,
          schema: String = "doc_id BIGINT, text STRING",
          k: Int = 16, bands: Int = 4,
          minEstJaccard: Double = 0.5): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 64)
      .parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, storeDir, pairsDir, k, bands, minEstJaccard)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** One micro-batch: hash the new docs, pair them against the committed
    * store and against each other, commit pairs then signatures. */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
                                      storeDir: String, pairsDir: String,
                                      k: Int, bands: Int,
                                      minEstJaccard: Double): Unit = {
    val spark = batch.sparkSession
    val sigs = Dedup.minhashSignatures(batch, k).persist()
    try {
      val newBanded = Dedup.bandedSignatureKeys(sigs, k, bands).persist()
      try {
        // committed signatures from PREVIOUS batches only: a crashed
        // attempt may have left this batch's own store partition behind,
        // and in-drop pairs are generated explicitly below
        val oldBanded = readStore(spark, storeDir, k)
          .filter(col("batch") =!= batchId).drop("batch")
          .transform(Dedup.bandedSignatureKeys(_, k, bands))
        val n = newBanded.select(col("band"), col("key"),
          col("doc_id").as("id_n"), col("sig").as("sig_n"))
        val o = oldBanded.select(col("band"), col("key"),
          col("doc_id").as("id_o"), col("sig").as("sig_o"))
        // new × store: either side may hold the smaller doc_id — normalize
        val cross = n.join(o, Seq("band", "key"))
          .select(
            least(col("id_n"), col("id_o")).as("doc_a"),
            greatest(col("id_n"), col("id_o")).as("doc_b"),
            when(col("id_n") < col("id_o"), col("sig_n")).otherwise(col("sig_o")).as("sig_a"),
            when(col("id_n") < col("id_o"), col("sig_o")).otherwise(col("sig_n")).as("sig_b"))
        // new × new (docs arriving in the same drop)
        val inDrop = n.join(
          newBanded.select(col("band"), col("key"),
            col("doc_id").as("doc_b"), col("sig").as("sig_b")),
          Seq("band", "key"))
          .filter(col("id_n") < col("doc_b"))
          .select(col("id_n").as("doc_a"), col("doc_b"),
            col("sig_n").as("sig_a"), col("sig_b"))
        val pairs = Dedup.pairsFromCandidates(cross.unionByName(inDrop),
          k, minEstJaccard)
        // pairs first, then the store commit: a replay after a partial
        // failure rewrites both partitions idempotently
        pairs.write.mode("overwrite").parquet(s"$pairsDir/batch=$batchId")
        sigs.write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
      } finally newBanded.unpersist()
    } finally sigs.unpersist()
  }

  /** The committed signature store (with its `batch` partition column), or
    * an empty table with the right shape before the first commit. */
  private def readStore(spark: SparkSession, storeDir: String, k: Int): DataFrame =
    try spark.read.parquet(storeDir)
    catch {
      case _: AnalysisException =>
        spark.range(0).select(
          (col("id").as("doc_id") +:
            (0 until k).map(i => col("id").as(f"mh$i%02d"))) :+
            lit(0L).as("batch"): _*)
    }
}
