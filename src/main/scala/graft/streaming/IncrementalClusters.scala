package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.{AnalysisException, Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental duplicate-CLUSTER maintenance — the piece that turns the
  * streaming pair detector into a nightly-curation primitive. Batch
  * [[Dedup.duplicateClusters]] answers "what are the clusters of THIS pair
  * table"; a nightly drop needs "fold these NEW pairs into yesterday's
  * labels" without reclustering the corpus-sized pair history.
  *
  * Label store layout under `labelsDir` (the 100-TB contract):
  *
  *  - `assign/batch=N/db=K/` — (doc_id, cluster_id) rows for docs FIRST
  *    seen in the pair graph at drop N, laid out in
  *    `db = pmod(hash(doc_id), DocBuckets)` partition directories. A row
  *    is written once and never rewritten by later drops; a drop's
  *    endpoint lookup partition-prunes to its own doc buckets (the same
  *    pruning contract as [[IncrementalDedup]]'s kb layout, plan-pinned
  *    in StreamingSpec).
  *  - `merges/batch=N/` — (old_label, new_label) rows: cluster roots that
  *    STOPPED being roots at drop N (a new pair bridged their cluster to
  *    a smaller-rooted one), mapped to the surviving root. The merge map
  *    is the small side by construction — it grows with cluster MERGES
  *    since the last compaction, not with docs — and rides as a broadcast
  *    in every resolution join. [[compact]] folds it back into the
  *    assignments and resets it, the same explicit bounded-small-side
  *    contract as the broadcast query side in `cosineTopK`.
  *
  * Per drop, [[update]] does: (1) look up the drop's pair endpoints in
  * the db-pruned assignment store, (2) resolve stored labels through the
  * broadcast merge map (driver-path-compressed, so one hop suffices),
  * (3) CONTRACT the new pairs to their representative labels and run the
  * two-tier [[Dedup.duplicateClusters]] on that contracted graph — the
  * driver union-find below the declared threshold, the distributed
  * adaptive-pointer-jump tier past it — (4) emit the merge delta for
  * existing roots the contraction dethroned, and (5) emit first-time
  * assignments for new docs. Work is O(new pairs + pruned lookups +
  * merge-map size); the assignment store is never scanned, only probed.
  *
  * Correctness (proven drop-count- and split-invariant in StreamingSpec):
  * every stored label is the minimum doc id of its cluster-so-far, so the
  * contracted node set of a merged component is {existing minima} ∪ {new
  * ids} and its min-label CC root is the GLOBAL component minimum — by
  * induction the N-drop result equals batch `duplicateClusters` over the
  * union of all drops' pairs, for ANY partition of the pairs into drops.
  *
  * Idempotent under replay: both per-batch outputs are overwrite-mode
  * directories keyed by batch id, and every read excludes the batch being
  * (re)written. Merges commit BEFORE assignments: a crash between the two
  * leaves a remap of old labels (consistent — relabeling is valid at any
  * time) rather than new docs labeled with roots the store doesn't know.
  */
object IncrementalClusters {

  /** Assignment-store doc-bucket fan-out; bounded so a drop's bucket set
    * is collectable for literal partition pruning. Coarser than the
    * signature store's KeyBuckets (64) on purpose: assignment rows are
    * two scalars, so a pruned bucket read is tiny either way, while the
    * per-drop partitioned-write commit cost scales with the directory
    * fan-out (measured the dominant update cost at 64). */
  val DocBuckets = 16

  def docBucket(id: Column): Column = pmod(hash(id), lit(DocBuckets))

  /** The store remembers its bucket fan-out in a `_doc_buckets` marker,
    * written on the first commit and REQUIRED to match on every later one
    * — the shared [[IncrementalDedup.checkFanoutMarker]] invariant (a
    * store laid out under a different constant would silently miss rows
    * in pruned lookups). */
  private def checkBucketMarker(spark: SparkSession, labelsDir: String): Unit =
    IncrementalDedup.checkFanoutMarker(spark, labelsDir, "doc_buckets", DocBuckets)

  /** Fold one drop's candidate pairs (doc_a, doc_b) into the label store.
    * `localSolveMaxPairs` is the contracted-graph tier threshold passed
    * through to [[Dedup.duplicateClusters]].
    *
    * REPLAY OBLIGATION for direct callers: a crash between the
    * merges/batch=N commit and the assign/batch=N commit leaves
    * [[currentLabels]] resolving existing docs to a new-doc cluster id
    * that has no assignment row yet; consistency is restored only by
    * re-running update() with the SAME batchId and pairs. The streaming
    * checkpoint path ([[IncrementalDedup.run]]) replays automatically;
    * direct callers (the d8 harness pattern) must re-invoke the failed
    * batch themselves before trusting currentLabels, or the
    * incremental ≡ batch contract silently stays broken. */
  def update(newPairs: DataFrame, labelsDir: String, batchId: Long,
             localSolveMaxPairs: Long = 2000000L): Unit = {
    val spark = newPairs.sparkSession
    def phase(name: String): Unit = // guide §1.5: label the micro-jobs
      spark.sparkContext.setJobDescription(s"d8 update $batchId: $name")
    IncrementalDedup.withWriterLease(spark, labelsDir) {
      checkBucketMarker(spark, labelsDir)
      val p = newPairs.select(col("doc_a"), col("doc_b")).persist()
      var endpoints: DataFrame = null
      var looked: DataFrame = null
      var cc: DataFrame = null
      try {
        // persisted: consumed twice (the bucket-set collect below and the
        // `looked` lookup join) — without the persist the endpoint distinct
        // shuffle re-executes once per consumer
        endpoints = p.select(col("doc_a").as("doc_id"))
          .union(p.select(col("doc_b").as("doc_id"))).distinct()
          .withColumn("db", docBucket(col("doc_id"))).persist()
        // the drop's bucket set: bounded (≤ DocBuckets) by construction.
        // Skipped entirely while the store has no assignments yet (the
        // first drop): the pruned lookup below is empty either way, so the
        // bucket-set job would only burn a scheduling round-trip.
        val storeHasAssigns = {
          val assignPath = new org.apache.hadoop.fs.Path(labelsDir, "assign")
          assignPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .exists(assignPath)
        }
        phase("endpoint buckets")
        val dbs =
          if (!storeHasAssigns) Seq.empty[Int]
          else endpoints.select("db").distinct()
            .collect().map(_.getInt(0)).toSeq
        val assigns = prunedAssignments(spark, labelsDir, p, dbs,
          excludeBatch = batchId)
        phase("merge map")
        val merges = resolvedMerges(spark, labelsDir,
          p.schema("doc_a").dataType, excludeBatch = Some(batchId))
        // stored label (null for first-seen docs) resolved through the
        // merge map to the CURRENT root = the doc's representative
        looked = endpoints.drop("db")
          .join(assigns.select(col("doc_id"),
            col("cluster_id").as("stored")), Seq("doc_id"), "left")
          .join(broadcast(merges.select(col("old_label").as("stored"),
            col("new_label"))), Seq("stored"), "left")
          .select(col("doc_id"), col("stored"),
            coalesce(col("new_label"), col("stored"), col("doc_id")).as("rep"))
          .persist()
        // contract pairs to representative labels; intra-cluster pairs
        // vanish, so the CC input holds only genuinely-bridging edges
        val contracted = p
          .join(looked.select(col("doc_id").as("doc_a"), col("rep").as("rep_a")),
            Seq("doc_a"))
          .join(looked.select(col("doc_id").as("doc_b"), col("rep").as("rep_b")),
            Seq("doc_b"))
          .filter(col("rep_a") =!= col("rep_b"))
          .select(col("rep_a").as("doc_a"), col("rep_b").as("doc_b"))
          .distinct()
        phase("contracted CC")
        cc = Dedup.duplicateClusters(contracted,
          localSolveMaxPairs = localSolveMaxPairs).persist()
        // merge delta: existing roots dethroned by the contraction
        val existingReps = looked.filter(col("stored").isNotNull)
          .select(col("rep").as("doc_id")).distinct()
        val deltaM = cc.join(existingReps, Seq("doc_id"))
          .filter(col("doc_id") =!= col("cluster_id"))
          .select(col("doc_id").as("old_label"), col("cluster_id").as("new_label"))
        // one file: the merge map is the operator's declared bounded-small
        // side (it rides as a broadcast), so a single part file per batch
        // is the right shape at any scale
        phase("merge delta write")
        deltaM.coalesce(1).write.mode("overwrite")
          .parquet(s"$labelsDir/merges/batch=$batchId")
        // first-time assignments for docs the store has never seen; the
        // left join is belt only — every new endpoint survives into the
        // contracted graph (its rep is itself and can never equal the
        // other side's rep), so cc covers it
        val newAssign = looked.filter(col("stored").isNull)
          .select(col("doc_id"))
          .join(cc.withColumnRenamed("cluster_id", "cid"), Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("cid"), col("doc_id")).as("cluster_id"),
            docBucket(col("doc_id")).as("db"))
        // cluster the write by its partition column first: without this
        // every upstream task writes a file into every db directory it
        // touches (the classic partitionBy small-file explosion — up to
        // tasks × DocBuckets files per drop); hashing on db makes it one
        // file per (db, post-AQE partition), and AQE sizes the partition
        // count to the drop's actual volume
        phase("assign write")
        newAssign.repartition(col("db"))
          .write.partitionBy("db").mode("overwrite")
          .parquet(s"$labelsDir/assign/batch=$batchId")
      } finally {
        spark.sparkContext.setJobDescription(null)
        if (cc != null) cc.unpersist()
        if (looked != null) looked.unpersist()
        if (endpoints != null) endpoints.unpersist()
        p.unpersist(): Unit
      }
    }
  }

  /** The current (doc_id, cluster_id) labels: every assignment resolved
    * through the broadcast merge map. One probe-side broadcast join over
    * the store — no shuffle; the trailing dropDuplicates (scalar pair
    * rows only) absorbs the identical duplicate rows a crashed
    * [[compact]] add-phase can leave behind. */
  def currentLabels(spark: SparkSession, labelsDir: String): DataFrame = {
    val assigns = spark.read.parquet(s"$labelsDir/assign")
      .select("doc_id", "cluster_id")
    val merges = resolvedMerges(spark, labelsDir,
      assigns.schema("doc_id").dataType, excludeBatch = None)
    assigns
      .join(broadcast(merges.select(col("old_label").as("cluster_id"),
        col("new_label"))), Seq("cluster_id"), "left")
      .select(col("doc_id"),
        coalesce(col("new_label"), col("cluster_id")).as("cluster_id"))
      .dropDuplicates("doc_id", "cluster_id")
  }

  /** Fold merges with batch ≤ `throughBatch` into the assignment store
    * (rewritten as one db-partitioned base `assign/batch=-(throughBatch+1)`)
    * and delete the folded merge directories. Later merge batches remain
    * applicable untouched: their old_labels were still roots after
    * `throughBatch`, so folding earlier merges cannot rewrite them.
    * Crash-safe by the same ADD-THEN-DELETE + `_SUCCESS`-gated recovery
    * protocol as [[IncrementalDedup.compactStore]]; the crash window can
    * only duplicate identical label rows (absorbed by `currentLabels`),
    * never lose or corrupt one. */
  def compact(spark: SparkSession, labelsDir: String, throughBatch: Long): Unit = {
    import org.apache.hadoop.fs.Path
    require(throughBatch >= 0, s"throughBatch must be >= 0, got $throughBatch")
    val root = new Path(labelsDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(root, "assign"))) return
    IncrementalDedup.withWriterLease(spark, labelsDir) {
      // the base rewrite below recomputes db = docBucket(doc_id) with THIS
      // binary's constant — under a mismatched marker that would lay out a
      // base the marker lies about, re-arming the silent mis-pruning
      // hazard for every later update
      checkBucketMarker(spark, labelsDir)
      def dirsOf(sub: String): Map[Long, Path] =
        IncrementalDedup.batchDirsOf(fs, new Path(root, sub))
      val targetId = -(throughBatch + 1)
      IncrementalDedup.requireCoverage(dirsOf("assign").keySet, throughBatch)
      val assignDirs = dirsOf("assign")
      val mergeable = assignDirs.keySet
        .filter(b => b != targetId && (b < 0 || b <= throughBatch))
      val mergesToFold = dirsOf("merges").keySet.filter(_ <= throughBatch)
      if (mergeable.isEmpty && mergesToFold.isEmpty) return
      val targetComplete = assignDirs.contains(targetId) &&
        fs.exists(new Path(assignDirs(targetId), "_SUCCESS"))
      if (assignDirs.contains(targetId) && !targetComplete)
        fs.delete(assignDirs(targetId), true): Unit
      if (!targetComplete) {
        val assigns = spark.read.parquet(s"$labelsDir/assign")
          .filter(col("batch") <= throughBatch)
          .select("doc_id", "cluster_id")
        val merges = resolvedMerges(spark, labelsDir,
          assigns.schema("doc_id").dataType,
          excludeBatch = None, maxBatch = Some(throughBatch))
        assigns
          .join(broadcast(merges.select(col("old_label").as("cluster_id"),
            col("new_label"))), Seq("cluster_id"), "left")
          .select(col("doc_id"),
            coalesce(col("new_label"), col("cluster_id")).as("cluster_id"),
            docBucket(col("doc_id")).as("db"))
          .dropDuplicates("doc_id", "cluster_id")
          // cluster by the partition column (same reason as update's
          // assignment write): this is the store's LARGEST write, and an
          // unclustered partitionBy fans out tasks × DocBuckets part files
          .repartition(col("db"))
          .write.partitionBy("db").mode("overwrite")
          .parquet(s"$labelsDir/assign/batch=$targetId")
      }
      val assignNow = dirsOf("assign")
      mergeable.foreach(b => assignNow.get(b).foreach(p => fs.delete(p, true): Unit))
      val mergeNow = dirsOf("merges")
      mergesToFold.foreach(b => mergeNow.get(b).foreach(p => fs.delete(p, true): Unit))
    }
  }

  /** The assignment store restricted to previous batches and the given doc
    * buckets — `db` is a literal isin over a partition column, so only the
    * matching directories are listed and read (partition pruning,
    * plan-pinned in StreamingSpec). Empty-with-schema before first commit. */
  private[streaming] def prunedAssignments(spark: SparkSession, labelsDir: String,
                                           idTemplate: DataFrame, dbs: Seq[Int],
                                           excludeBatch: Long): DataFrame = {
    val store =
      try spark.read.parquet(s"$labelsDir/assign")
      catch {
        case _: AnalysisException => // nothing committed yet
          idTemplate.select(col("doc_a").as("doc_id"),
            col("doc_a").as("cluster_id"),
            lit(0L).as("batch"), lit(0).as("db")).limit(0)
      }
    store.filter(col("batch") =!= excludeBatch)
      .filter(col("db").isin(dbs: _*))
      .select("doc_id", "cluster_id")
  }

  /** The merge map with chains PATH-COMPRESSED on the driver (an old root
    * merged at drop i can point at a root itself merged at drop j > i;
    * compressing once at read means every resolution join is one hop).
    * The collect is the operator's declared bounded-small-side contract —
    * merge entries accumulate per cluster merge between compactions. */
  private def resolvedMerges(spark: SparkSession, labelsDir: String,
                             idType: org.apache.spark.sql.types.DataType,
                             excludeBatch: Option[Long],
                             maxBatch: Option[Long] = None): DataFrame = {
    import scala.jdk.CollectionConverters._
    val raw =
      try {
        val m = spark.read.parquet(s"$labelsDir/merges")
        val f1 = excludeBatch.map(b => m.filter(col("batch") =!= b)).getOrElse(m)
        maxBatch.map(b => f1.filter(col("batch") <= b)).getOrElse(f1)
          .select("old_label", "new_label").collect()
      } catch {
        case _: AnalysisException => Array.empty[org.apache.spark.sql.Row]
      }
    val next = new java.util.HashMap[Any, Any]()
    raw.foreach(r => next.put(r.get(0), r.get(1)))
    // hop bound: a healthy merge map is acyclic (merges always point at a
    // strictly smaller surviving root), so no chain can be longer than the
    // map itself. A corrupted store would otherwise hang the driver in
    // this loop forever — fail loudly instead.
    def find(x: Any): Any = {
      var r = x
      var hops = 0
      while (next.containsKey(r)) {
        hops += 1
        require(hops <= next.size,
          s"cyclic or overlong merge chain in $labelsDir/merges starting " +
            s"at $x (>${next.size} hops) — the merge store is corrupted; " +
            "rebuild it (e.g. recluster from the pair history) before reading")
        r = next.get(r)
      }
      r
    }
    val rows = next.keySet().asScala.toSeq
      .map(k => org.apache.spark.sql.Row(k, find(k)))
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("old_label", idType),
        org.apache.spark.sql.types.StructField("new_label", idType))))
  }
}
