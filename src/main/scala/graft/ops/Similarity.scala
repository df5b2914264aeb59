package graft.ops

import graft.corpus.Synth
import graft.functions.VecMath
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k with the small query side broadcast
  * (no shuffle of the corpus). Scale path: random-hyperplane LSH buckets —
  * the corpus is bucketed once by signature, queries probe only their
  * bucket, turning the scan into an equi-join. Dot products are codegen'd
  * `zip_with`/`aggregate` expressions, not UDFs.
  */
object Similarity {

  /** Cosine similarity of two float-array columns (computed in double,
    * native codegen expressions — never the aggregate(zip_with(...)) form,
    * which materializes a dim-element struct array per row). */
  def cosine(a: Column, b: Column): Column =
    VecMath.vecDot(a, b) / (VecMath.vecNorm(a) * VecMath.vecNorm(b))

  /** Sequential-order double dot product as a tight-loop UDF. Kept ONLY as
    * the test baseline for [[graft.functions.VecDot]] (the native codegen
    * expression the operators actually use — same strict left-to-right
    * summation, bit-identical results, but no per-call Seq[Float]
    * deserialization and no codegen break). */
  val dotUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (a: Seq[Float], b: Seq[Float]) =>
      var s = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }

  /** Euclidean norm column via the same strict summation (native codegen). */
  def normCol(emb: Column): Column = VecMath.vecNorm(emb)

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). Query side is broadcast; ranking is
    * deterministic (cosine desc, then vec_id). Output ranks only — FP
    * noise in the similarity value itself stays out of the contract. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      normCol(col("embedding")).as("q_norm"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
      normCol(col("embedding")).as("c_norm"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos",
        VecMath.vecDot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** Deterministic random hyperplanes: component j of plane p is a unit
    * normal-ish value from splitmix64 (seeded, reproducible cluster-wide). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, j) =>
      val u = (Synth.splitmix64(seed ^ (p * 1000003L + j)) >>> 11) * 1.1102230246251565e-16
      u * 2.0 - 1.0
    }

  /** Sign-random-projection LSH signature (one int bucket key per vector).
    * Each plane dot is a native [[graft.functions.VecDotConst]] — the
    * previous `aggregate(zip_with(...))` form materialized a dim-element
    * struct array per plane per row (planes × dim structs/row); the
    * compiled loop reads the ArrayData in place. Same left-to-right double
    * sum, so bucket signs (and every oracle) are unchanged. */
  def lshBucket(emb: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (plane, i) =>
      when(VecMath.vecDotConst(emb, plane) >= 0, lit(1 << i)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Deterministic random coarse-quantizer centers for IVF (same splitmix64
    * scheme as `hyperplanes`, different stream). Data-independent on
    * purpose: the DuckDB oracle must reproduce cell assignment from
    * literals alone. K-means-trained centers (`trainedCenters`) are the
    * production upgrade — training moves recall, never correctness, and
    * slots into the identical assignment expression. */
  def ivfCenters(k: Int, dim: Int, seed: Long): Array[Array[Double]] =
    hyperplanes(k, dim, seed ^ 0x1BF52L)

  /** Lloyd's k-means on a deterministic bounded sample — the IVF
    * index-training phase. Driver-side by design: ANN indexes train on
    * samples even at 100 TB; assignment of the full corpus stays
    * distributed. The sample is drawn in SEEDED HASH ORDER
    * (`md5(seed || vec_id)`), not a vec_id prefix: a prefix is whatever
    * the ingest happened to load first (one crawl slice, one language,
    * one day) and trains unrepresentative centers at scale, while the
    * hash order is an unbiased deterministic shuffle — same sample every
    * run, executed as a distributed top-N (TakeOrderedAndProject), never
    * a full sort. */
  def trainedCenters(corpus: DataFrame, k: Int, iters: Int = 5,
                     sampleN: Int = 512,
                     seed: Long = Synth.DefaultSeed): Array[Array[Double]] = {
    val sample = corpus.select(col("vec_id"), col("embedding"))
      .orderBy(md5(concat_ws("_", lit(seed), col("vec_id"))), col("vec_id"))
      .limit(sampleN)
      .collect().map(_.getSeq[Float](1).toArray.map(_.toDouble))
    require(sample.length >= k, s"need >= $k sample vectors")
    var centers = sample.take(k).map(_.clone())
    val dim = sample(0).length
    (0 until iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < dim) { val t = v(i) - centers(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      centers = centers.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else sums(c).map(_ / counts(c))
      }
    }
    centers
  }

  /** IVF cell id (1-based): index of the nearest center by squared L2.
    * |v|² is constant per row, so ranking uses −2·v·c + |c|² — one
    * VecDotConst per center, first-min tie-break (array_position), shared
    * exactly with the oracle's (dist, cid) row_number. */
  def ivfCellCol(emb: Column, centers: Array[Array[Double]]): Column = {
    val dists = centers.toIndexedSeq.map { c =>
      graft.functions.VecMath.vecDotConst(emb, c.map(-2.0 * _)) +
        lit(c.map(x => x * x).sum)
    }
    val arr = array(dists: _*)
    array_position(arr, array_min(arr)).cast("int")
  }

  /** The `nprobe` nearest cell ids (1-based), ordered nearest-first: the
    * per-center distance structs sort by (dist, cell) — the same first-min
    * tie-break as [[ivfCellCol]], whose result is always element 1. */
  def ivfProbeCellsCol(emb: Column, centers: Array[Array[Double]],
                       nprobe: Int): Column = {
    require(nprobe >= 1 && nprobe <= centers.length,
      s"nprobe must be in [1, ${centers.length}], got $nprobe")
    val dists = centers.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      struct(
        (graft.functions.VecMath.vecDotConst(emb, c.map(-2.0 * _)) +
          lit(c.map(x => x * x).sum)).as("dist"),
        lit(i + 1).as("cell"))
    }
    transform(slice(array_sort(array(dists: _*)), 1, nprobe), x => x("cell"))
  }

  /** IVF ANN top-k: corpus partitioned into `nCenters` inverted lists by
    * nearest center; each query scans only its `nprobe` nearest lists
    * (equi-join on cell after exploding the probe set). The second classic
    * ANN family next to sign-projection LSH — at scale the inverted lists
    * are the partition/bucket layout and `nCenters` grows with corpus size
    * (cells stay bounded).
    *
    * `nprobe` is the recall knob: with nprobe=1 a query vector near a
    * Voronoi boundary loses true neighbors that quantized into the adjacent
    * cell; probing the p nearest cells recovers them at p× the in-list scan
    * cost — still nprobe/nCenters of the corpus, never a full scan. A
    * corpus vector lives in exactly one list, so the probe union needs no
    * dedup before ranking.
    *
    * `dim` MUST equal the embedding width: center dots use min-length
    * prefix semantics, so a wider corpus would silently be cell-assigned
    * on the first `dim` components only (recall collapse, no error). */
  def ivfAnnTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 nCenters: Int = 16, dim: Int = 64,
                 seed: Long = Synth.DefaultSeed,
                 centersOverride: Option[Array[Array[Double]]] = None,
                 nprobe: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centers = centersOverride.getOrElse(ivfCenters(nCenters, dim, seed))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
      normCol(col("embedding")).as("c_norm"),
      ivfCellCol(col("embedding"), centers).as("cell"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      normCol(col("embedding")).as("q_norm"),
      explode(ivfProbeCellsCol(col("embedding"), centers, nprobe)).as("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos",
        graft.functions.VecMath.vecDot(col("q_emb"), col("c_emb")) /
          (col("q_norm") * col("c_norm")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cell", "rank", "neighbor_id")
  }

  /** Multi-probe bucket set, nearest-first: element 1 is the base
    * [[lshBucket]] signature; elements 2..nprobe flip the sign bits with
    * the smallest |margin| (the planes the vector sits closest to — the
    * classic multi-probe LSH perturbation order). Flipping the
    * least-confident bit reaches the bucket a boundary vector's true
    * neighbors most likely quantized into. Margin ties break on plane
    * index (the struct's mask field is monotone in it). */
  def lshProbeBucketsCol(emb: Column, planes: Array[Array[Double]],
                         nprobe: Int): Column = {
    require(nprobe >= 1 && nprobe <= planes.length + 1,
      s"nprobe must be in [1, ${planes.length + 1}], got $nprobe")
    val dots = planes.toIndexedSeq.zipWithIndex.map { case (p, i) =>
      (VecMath.vecDotConst(emb, p), i)
    }
    val base = dots.map { case (d, i) =>
      when(d >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
    if (nprobe == 1) array(base)
    else {
      val margins = dots.map { case (d, i) =>
        struct(abs(d).as("m"), lit(1 << i).as("mask"))
      }
      val flips = slice(array_sort(array(margins: _*)), 1, nprobe - 1)
      concat(array(base), transform(flips, f => base.bitwiseXOR(f("mask"))))
    }
  }

  /** LSH-bucketed ANN: corpus and queries hash to sign-projection buckets;
    * each query searches only its `nprobe` buckets (equi-join on bucket key
    * after exploding the probe set — base bucket plus the lowest-|margin|
    * single-bit flips, see [[lshProbeBucketsCol]]). With `nPlanes` = 8 →
    * 256 buckets ⇒ ~256/nprobe× less work than brute force, at recall
    * traded by bucket granularity; `nprobe` is the recall knob for boundary
    * vectors. Probe buckets are distinct by construction (distinct XOR
    * masks), so the union needs no dedup before ranking. `dim` MUST equal
    * the embedding width (plane dots use min-length prefix semantics — a
    * wider corpus would silently bucket on the first `dim` components). */
  def lshAnnTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 nPlanes: Int = 8, dim: Int = 64,
                 seed: Long = Synth.DefaultSeed,
                 nprobe: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val planes = hyperplanes(nPlanes, dim, seed)
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
      normCol(col("embedding")).as("c_norm"),
      lshBucket(col("embedding"), planes).as("bucket"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      normCol(col("embedding")).as("q_norm"),
      explode(lshProbeBucketsCol(col("embedding"), planes, nprobe)).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos",
        VecMath.vecDot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "bucket", "rank", "neighbor_id")
  }
}
