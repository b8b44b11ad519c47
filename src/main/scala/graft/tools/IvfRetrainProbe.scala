package graft.tools

import graft.ops.{IvfIndex, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what the IVF RETRAIN CADENCE (q42h) buys back. Two
  * fixtures, each run through the same lifecycle — gen-1: quantizer
  * trained (one Lloyd step) on the ORIGINAL corpus only, the delta
  * assigned under the frozen quantizer and appended ([[IvfIndex
  * .appendAssignments]], the Faiss `add` semantic); gen-2: retrain
  * over the union (q42f's deterministic 3-round k-means) + full
  * re-assignment via [[IvfIndex.retrain]]:
  *
  *  - `natural`: the delta is an undrifted slice of the same
  *    distribution (q42h's oracle-replayable fixture) — retrain buys
  *    little recall HERE BY CONSTRUCTION, which is the honest
  *    statement of when the cadence is needed;
  *  - `drifted`: the delta is shifted by a constant direction the
  *    original quantizer never saw (the actual production failure —
  *    a new domain/language entering the corpus). Frozen-quantizer
  *    symptoms are measured directly: the drifted region CROWDS into
  *    few cells (maxCellFrac), so probes of drifted queries scan a
  *    corpus-size-proportional candidate set (candPerQ) — the probe
  *    cost bound nprobe/cells is lost even where recall holds.
  *    Retraining re-partitions the grown distribution and restores
  *    the bound.
  *
  * Reports recall@5 vs exact brute force over the union (nprobe=4 and
  * the derived wide probe), per-query verify-candidate volume, max
  * cell occupancy fraction, and the retrain wall it costs vs the
  * per-arrival append wall. SCALING.md records the output (round-19).
  *
  * Run: sbt "runMain graft.tools.IvfRetrainProbe <sfDir>"
  */
object IvfRetrainProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    // the natural fixture mirrors q42h exactly (90/10 split, same
    // distribution); the drifted fixture is the production failure —
    // 30% of the grown corpus arrives in THREE coherent new modes
    // (each a constant shift on its own dimension — new domains the
    // original quantizer never partitioned)
    val naturalCorpus0 = emb.filter($"vec_id" % 10 =!= 7).localCheckpoint()
    val naturalDelta = emb.filter($"vec_id" % 10 === 7)
    val driftedCorpus0 = emb.filter($"vec_id" % 10 < 7).localCheckpoint()
    val driftedDelta = emb.filter($"vec_id" % 10 >= 7).select($"vec_id",
      transform($"embedding",
        (x, i) => when(i === pmod($"vec_id", lit(3)).cast("int"),
          x + lit(3.0f)).otherwise(x)).as("embedding"))

    def run(tag: String, corpus0: DataFrame, delta: DataFrame): Unit = {
      val deltaCp = delta.localCheckpoint()
      val union = corpus0.unionByName(deltaCp).localCheckpoint()
      val n = union.count()
      // queries FROM THE DELTA REGION — the arrivals a crawl pipeline
      // actually probes next (hard-negative mining over fresh data)
      val queries = deltaCp.filter($"vec_id" % 100 === 7).localCheckpoint()
      val nQ = queries.count()
      val exact5 = Similarity.cosineTopK(union, queries, k = 5)
        .select("qid", "vid").localCheckpoint()
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_ivfrp_$tag").toString + "/lifecycle"
      val c0 = Similarity.ivfCentroids(corpus0, cells = 16)
      IvfIndex.commitGeneration(spark, corpus0, c0, root)
      val (_, appendWall) = timed {
        IvfIndex.appendAssignments(spark, deltaCp, c0,
          IvfIndex.currentGenDir(spark, root).get + "/assign")
      }
      def measure(nprobe: Int): (Double, Double, Double) = {
        val (ce, as) = IvfIndex.loadCurrent(spark, root)
        val hits = Similarity.ivfTopKProbed(ce, as, queries, k = 5, nprobe = nprobe)
          .select("qid", "vid").intersect(exact5).count()
        // verify-candidate volume: rows the exact-cosine stage scores
        val cand = Similarity.probeCells(ce, queries, nprobe)
          .select("qid", "cell")
          .join(as.select("vid", "cell"), Seq("cell")).count()
        val maxCell = as.groupBy("cell").count()
          .agg(max("count")).as[Long].head().toDouble / n
        (hits.toDouble / (nQ * 5), cand.toDouble / nQ, maxCell)
      }
      // the DERIVED trigger's reading: live max-cell occupancy vs the
      // committed baseline — the separation between the two fixtures
      // is what sets IvfIndex.RetrainOccupancyFactor
      println(f"[ivfretrain] fixture=$tag%-8s trigger: driftRatio=${IvfIndex.driftRatio(spark, root)}%.3f " +
        f"needsRetrain=${IvfIndex.needsRetrain(spark, root)}")
      val wide = graft.ops.Pq.nprobeFor(16)
      val (fr4, fc4, fMax) = measure(4)
      val (frW, _, _) = measure(wide)
      val (_, retrainWall) = timed {
        IvfIndex.retrain(spark, union, cells = 16, iters = 3, root)
      }
      println(f"[ivfretrain] fixture=$tag%-8s post-retrain: driftRatio=${IvfIndex.driftRatio(spark, root)}%.3f " +
        f"needsRetrain=${IvfIndex.needsRetrain(spark, root)}")
      val (rr4, rc4, rMax) = measure(4)
      val (rrW, _, _) = measure(wide)
      println(f"[ivfretrain] fixture=$tag%-8s n=$n queries=$nQ " +
        f"frozen(recall@4=$fr4%.3f recall@$wide=$frW%.3f candPerQ=$fc4%.0f maxCellFrac=$fMax%.3f) " +
        f"retrained(recall@4=$rr4%.3f recall@$wide=$rrW%.3f candPerQ=$rc4%.0f maxCellFrac=$rMax%.3f) " +
        f"appendWall=$appendWall%.2f retrainWall=$retrainWall%.2f")
    }

    run("natural", naturalCorpus0, naturalDelta)
    run("drifted", driftedCorpus0, driftedDelta)
    spark.stop()
  }
}
