package graft

import graft.ops.ShingleIndex
import graft.queries.NorthStar

/** q79b — the streaming LSM accept lifecycle. Pins the two claims the
  * entry's shared oracle rests on:
  *   1. batch ≡ stream: running the probe → accept → append loop per
  *      micro-batch (with in-loop compaction) converges to exactly the
  *      verdicts of q41o's single-batch lifecycle — trigger count
  *      changes nothing.
  *   2. the derived maintenance rule ran INSIDE the stream: four
  *      non-empty accept slices drive segments 1→2→3→4, compaction
  *      fires exactly once at S* = 4, and the final generation carries
  *      2 live segments at gen 6 — so the probe tax stays bounded for
  *      an unbounded arrival stream.
  */
class StreamingLsmSpec extends SparkSpec {

  test("streaming LSM accept converges to the batch lifecycle verdicts") {
    // entry DFs self-evict their checkpoint blocks after the first
    // action (CheckpointJanitor.evictAfterConsumption) — collect once
    val streamed = NorthStar.q79b.fn(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val batch = NorthStar.q41o.fn(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch,
      "micro-batched accept diverged from the single-batch lifecycle")
    // non-trivial on both sides: batch2's copies of batch1's accepted
    // docs match ONLY through segments the stream appended (fresh fn
    // call per action — the memoized artifact makes re-probing cheap)
    val dist = NorthStar.q79b.fn(spark, sf)
      .groupBy("matched").count().collect()
      .map(r => r.get(0).toString.toInt -> r.getLong(1)).toMap
    assert(dist.getOrElse(1, 0L) > 0, "no batch2 doc matched via the stream's appends")
    assert(dist.getOrElse(0, 0L) > 0, "no novel batch2 doc survived")
  }

  test("the derived compaction trigger fired exactly once mid-stream") {
    NorthStar.q79b.fn(spark, sf).collect() // ensure the artifact is built
    val root = NorthStar.q79bArtifactRoot(sf).getOrElse(
      fail("q79b ran but left no memoized artifact root"))
    val m = ShingleIndex.currentManifest(spark, root).getOrElse(
      fail(s"no committed LSM generation under $root"))
    // save(g1) + 4 appends + 1 compaction = gen 6; the compaction at
    // S* = 4 left 1 segment and the 4th append made it 2
    assert(m.gen === 6L, s"expected gen 6 (4 appends + 1 compaction), got ${m.gen}")
    assert(m.segments.size === 2, s"expected 2 live segments, got ${m.segments.size}")
    assert(m.segments.forall(_.docs > 0L), "a live segment carries zero docs")
    assert(!ShingleIndex.shouldCompact(m))
  }
}
