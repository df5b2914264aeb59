package graft.pipeline

import graft.corpus.Synth
import graft.kernel.Extract
import graft.model.{Doc, DocResult, Span}
import org.scalatest.funsuite.AnyFunSuite

/** Distributed-correctness properties (SURVEY.md §5): extraction is
  * partitioning-invariant, the skew (chunking) path is equivalent to the
  * single-pass kernel, salting never loses or duplicates docs, and
  * checkpoint resume ≡ cold run. */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def canon(rs: Seq[DocResult]): Seq[(String, Seq[Span], Boolean, String, Int, Int)] =
    rs.map(r => (r.doc_id, r.spans, r.success, r.failure_code, r.n_spans, r.n_pages))
      .sortBy(_._1)

  test("pipeline result is independent of partitioning and salt") {
    import spark.implicits._
    val docs = ExtractionPipeline.synthDocs(spark, 120, seed = 7, parallelism = 4).cache()
    val a = ExtractionPipeline.extract(docs,
      ExtractionPipeline.Config(numPartitions = 3, salt = 0)).collect().toSeq
    val b = ExtractionPipeline.extract(docs,
      ExtractionPipeline.Config(numPartitions = 11, salt = 1234)).collect().toSeq
    assert(canon(a) == canon(b))
    assert(a.size == 120)
    docs.unpersist()
  }

  test("SpanCodec round-trips exactly: unicode, null fields, any offsets") {
    val rnd = new scala.util.Random(31)
    val pool = Seq("plain ascii", "देवनागरी पाठ 😀", "𐀀 supplementary ｡",
      "", null, "tab\tnl\nquote\"back\\slash", "x" * 5000)
    def randSpan(): Span = Span(
      Seq("text", "media", "Table", "Weird-kind", "", null)(rnd.nextInt(6)),
      pool(rnd.nextInt(pool.size)), pool(rnd.nextInt(pool.size)),
      rnd.nextInt() // any int, including negative
    )
    (0 until 200).foreach { _ =>
      val spans = Vector.fill(rnd.nextInt(40))(randSpan())
      val back = SpanCodec.unpack(SpanCodec.pack(spans))
      assert(back == spans, s"roundtrip diverged for $spans")
    }
    // degenerate forms: null and empty both decode to empty (extractDoc
    // maps both to the same EMPTY_DOC result)
    assert(SpanCodec.unpack(SpanCodec.pack(null)) == Vector.empty)
    assert(SpanCodec.unpack(SpanCodec.pack(Vector.empty)) == Vector.empty)
    // extreme offsets survive the zigzag varint
    for (off <- Seq(Int.MinValue, Int.MaxValue, -1, 0)) {
      val s = Vector(Span("text", "t", "", off))
      assert(SpanCodec.unpack(SpanCodec.pack(s)) == s)
    }
  }

  test("packed-span shuffle path ≡ row-form path on the synthetic corpus") {
    val docs = ExtractionPipeline.synthDocs(spark, 200, seed = 13, parallelism = 4).cache()
    val packed = ExtractionPipeline.extract(docs,
      ExtractionPipeline.Config(numPartitions = 5, packSpans = true)).collect().toSeq
    val row = ExtractionPipeline.extract(docs,
      ExtractionPipeline.Config(numPartitions = 5, packSpans = false)).collect().toSeq
    assert(canon(packed) == canon(row))
    assert(packed.size == 200)
    docs.unpersist()
  }

  test("salted repartition occupies every partition with balanced load " +
    "(no double-hash collapse)") {
    // regression pin: repartition(P, pmod(hash+salt, P)) lets
    // HashPartitioning RE-hash the pre-bucketed [0,P) value, collapsing
    // the layout to ~(1-1/e)P occupied partitions with up to 4x hot bins
    // (measured: 37/64 at the bench's P=64). The fixed full-range-hash
    // expression must hit all P partitions with near-uniform load.
    val docs = ExtractionPipeline.synthDocs(spark, 1024, seed = 9, parallelism = 4)
    val loads = ExtractionPipeline.extract(docs,
      ExtractionPipeline.Config(numPartitions = 8))
      .groupByKey(_.partition_id)(org.apache.spark.sql.Encoders.scalaInt)
      .mapGroups { (pid, it) => (pid, it.size) }(
        org.apache.spark.sql.Encoders.product[(Int, Int)])
      .collect().toMap
    assert(loads.keySet == (0 until 8).toSet,
      s"all 8 partitions must be occupied: $loads")
    // binomial(1024, 1/8): mean 128, sd ~10.6 — 4 sd bounds are loose
    // enough to be deterministic-stable yet catch any collapse/hot bin
    assert(loads.values.forall(n => n > 85 && n < 171),
      s"partition loads must be near-uniform: $loads")
  }

  test("chunked (skew) path equals the single-pass kernel") {
    import spark.implicits._
    // force many docs down the chunk path with a tiny threshold
    val docs = ExtractionPipeline.synthDocs(spark, 60, seed = 99, parallelism = 4).cache()
    val direct = docs.collect().map(d => Extract.extractDoc(d)).toSeq
    val piped = ExtractionPipeline.extract(docs,
      ExtractionPipeline.Config(numPartitions = 5, splitOversized = true,
        oversizedSpanThreshold = 3, pagesPerChunk = 2)).collect().toSeq
    assert(canon(piped) == canon(direct))
    docs.unpersist()
  }

  test("chunkDoc covers all spans exactly once, page-aligned") {
    val doc = Synth.docFor(1, 42) // arbitrary
    val big = Doc("big", (0 until 37).flatMap { p =>
      Seq(Span("text", s"# page $p", "", p * 2),
        Span("media", "", s"synth://img/10,10,200,200", p * 2 + 1))
    })
    val chunks = ExtractionPipeline.chunkDoc(big, 4)
    assert(chunks.flatMap(_.spans).sortBy(_.offset) == big.spans.sortBy(_.offset))
    // every chunk starts with a text span (page boundary)
    assert(chunks.forall(_.spans.head.kind == "text"))
    assert(chunks.map(_.chunk_idx) == chunks.indices)
    assert(ExtractionPipeline.chunkDoc(doc, 1000).size == 1)
  }

  test("partition metrics sum to corpus totals") {
    val docs = ExtractionPipeline.synthDocs(spark, 80, seed = 3, parallelism = 4)
    val results = ExtractionPipeline.extract(docs,
      ExtractionPipeline.Config(numPartitions = 6)).cache()
    val m = ExtractionPipeline.partitionMetrics(results, snapshotId = 1).collect()
    val rs = results.collect()
    assert(m.map(_.n_docs).sum == rs.length)
    assert(m.map(_.n_spans).sum == rs.map(_.n_spans.toLong).sum)
    assert(m.map(_.n_pages).sum == rs.map(_.n_pages.toLong).sum)
    assert(m.map(_.n_failures).sum == rs.count(!_.success))
    results.unpersist()
  }

  test("snapshot resume equals cold run") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-snap").toString
    val coldDir = java.nio.file.Files.createTempDirectory("graft-cold").toString
    val docs = ExtractionPipeline.synthDocs(spark, 100, seed = 5, parallelism = 4).cache()
    val cfg = ExtractionPipeline.Config(numPartitions = 4)

    // cold run in one go
    Snapshot.run(docs, coldDir, cfg, nBuckets = 8, bucketsPerCommit = 8)
    // interrupted run: 1 commit (2 buckets), then resume
    val first = Snapshot.run(docs, dir, cfg, nBuckets = 8, bucketsPerCommit = 2, maxCommits = 1)
    assert(first.bucketsRun.size == 2)
    assert(Snapshot.completedBuckets(dir).size == 2)
    val second = Snapshot.run(docs, dir, cfg, nBuckets = 8, bucketsPerCommit = 2)
    assert(second.bucketsSkipped.toSet == first.bucketsRun.toSet)

    val resumed = canon(Snapshot.readResults(spark, dir).collect().toSeq)
    val cold = canon(Snapshot.readResults(spark, coldDir).collect().toSeq)
    assert(resumed == cold)
    assert(resumed.size == 100)

    // time travel: snapshot 0 sees exactly the first commit's docs, the
    // latest snapshot sees everything, and the manifest log matches
    val log = Snapshot.snapshots(dir)
    assert(log.map(_._1) == log.map(_._1).sorted && log.nonEmpty)
    val at0 = Snapshot.readAt(spark, dir, 0).collect()
    assert(at0.length == log.head._2.map(_.n_docs).sum,
      s"snapshot 0 row count vs its manifest lineage")
    assert(at0.length < 100, "older snapshot must not see later commits")
    assert(canon(Snapshot.readAt(spark, dir, log.last._1).collect().toSeq) == cold)
    assert(log.flatMap(_._2).map(_.n_docs).sum == 100)
    docs.unpersist()
  }

  test("partition probe returns a best config (A9)") {
    val docs = ExtractionPipeline.synthDocs(spark, 40, seed = 21, parallelism = 2)
    val probes = Tuning.probePartitioning(docs, Seq(2, 4))
    assert(probes.size == 2)
    assert(probes.forall(_.nDocs == 40))
    assert(Seq(2, 4).contains(Tuning.best(probes).numPartitions))
  }

  test("synth corpus is deterministic and heavy-tailed") {
    val a = (0L until 500L).map(Synth.docFor(Synth.DefaultSeed, _))
    val b = (0L until 500L).map(Synth.docFor(Synth.DefaultSeed, _))
    assert(a == b)
    val sizes = a.map(_.spans.size)
    assert(sizes.max > 20, s"expected a heavy tail, max=${sizes.max}")
    assert(sizes.count(_ <= 6) > 350, "most docs should be small")
  }
}
