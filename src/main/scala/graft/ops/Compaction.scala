package graft.ops

import org.apache.hadoop.fs.{FileContext, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction over a [[StagedRefresh]] root — the
  * `OPTIMIZE` table-maintenance primitive (Delta's bin-packing
  * compaction, Iceberg's rewrite_data_files). A table loaded by many
  * incremental micro-batches accumulates thousands of KB-scale files;
  * at 100 TB that is the #1 silent scan killer (per-file open/footer
  * cost dominates, and the driver's file listing itself becomes the
  * bottleneck long before a byte of data is read).
  *
  * The rewrite rides the SAME stage-and-swap machinery as a data
  * refresh: the compacted copy writes completely as the next
  * generation, the pointer swap is atomic, in-flight readers of the
  * fragmented generation finish undisturbed (GC spares the immediate
  * predecessor). Compaction is therefore a ZERO-DOWNTIME background
  * operation by construction — no new atomicity mechanism, which is
  * exactly the design argument for pointer-addressed generations.
  *
  * Output file count is sized from the OBSERVED byte total:
  * ceil(bytes / targetBytes), floor 1 — so the operation needs no
  * table-specific tuning and CONVERGES within one file of the target
  * sizing (not strictly idempotent: nOut derives from the compressed
  * byte total, and re-encoding many fragments into few files changes
  * compression, so a table sitting near a ceil boundary can shift by
  * one file across successive compactions — the honest claim). The
  * rewrite is `repartition(n)` — a round-robin exchange, the only
  * corpus-proportional term, chosen over `coalesce(n)` deliberately:
  * coalesce merges ADJACENT partitions and so inherits whatever skew
  * the fragment layout has, while round-robin yields uniform output
  * files (the point of compaction). Cost: one read + one shuffle +
  * one write of the live generation, same as any refresh.
  */
object Compaction {

  /** One parquet data file of a generation dir (excludes _SUCCESS etc). */
  private def dataFiles(ctx: FileContext, gen: Path) =
    ctx.util.listStatus(gen).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isFile && n.startsWith("part-") && n.endsWith(".parquet")
    }

  /** Compact the LIVE generation of `root` into ~`targetBytes` files
    * via a staged, atomically-swapped rewrite. Returns
    * (newGenerationName, filesBefore, filesAfter, liveBytes).
    * Single-writer discipline: callers serialize per root, like any
    * other refresh of that root. */
  def compact(spark: SparkSession, root: String,
      targetBytes: Long): (String, Int, Int, Long) = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val gen = StagedRefresh.currentGen(spark, root).getOrElse(
      throw new IllegalStateException(
        s"nothing to compact under $root (pointer file absent)"))
    val rootPath = new Path(root)
    val genPath = new Path(rootPath, gen)
    val ctx = FileContext.getFileContext(rootPath.toUri,
      spark.sparkContext.hadoopConfiguration)
    val before = dataFiles(ctx, genPath)
    // a part-file-less generation (e.g. a prior refresh of an empty
    // DataFrame) would otherwise fail below with an obscure
    // schema-inference AnalysisException — name the root instead
    if (before.isEmpty) throw new IllegalStateException(
      s"nothing to compact under $root: live generation $gen has no data files")
    val bytes = before.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val compacted = spark.read.parquet(genPath.toString).repartition(nOut)
    val newGen = StagedRefresh.refresh(compacted, root)
    val after = dataFiles(ctx, new Path(rootPath, newGen))
    (newGen, before.size, after.size, bytes)
  }
}
