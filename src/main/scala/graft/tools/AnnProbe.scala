package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-validation probe for the ANN paths (SCALING.md): measures
  * recall vs exact brute force, candidate volume, and wall for the
  * corpus-sized entry points (`annTopKScaled`, `ivfTopK`) on a given
  * embeddings table.
  *
  * Usage: runMain graft.tools.AnnProbe <sfDir> <queryIdModulus> [tables]
  */
object AnnProbe {

  def main(args: Array[String]): Unit = {
    // tables <= 0 (and the no-arg default) = the production derivation
    // (Similarity.tablesForCorpus); a positive value pins it for sweeps
    val (dir, qmodS, tables) = args match {
      case Array(d, q)    => (d, q, 0)
      case Array(d, q, t) => (d, q, t.toInt)
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = emb.count()
    val queries = emb.filter(col("vec_id") % qmodS.toLong === 0).localCheckpoint()
    val nQ = queries.count()
    val exact5 = Similarity.cosineTopK(emb, queries, k = 5)
      .select("qid", "vid").localCheckpoint()
    val (annHits, annWall) = timed {
      Similarity.annTopKScaled(emb, queries, k = 5, tables = tables)
        .select("qid", "vid").intersect(exact5).count()
    }
    val (ivfHits, ivfWall) = timed {
      Similarity.ivfTopK(emb, queries, k = 5, cells = 16, nprobe = 4)
        .select("qid", "vid").intersect(exact5).count()
    }
    val planes = Similarity.planesForCorpus(n)
    val (cand, candWall) = timed {
      Similarity.nearDupCandidates(emb, planes, tables = 4).count()
    }
    // Persisted-assignment lifecycle (the q42e production shape,
    // round-13 verdict item 7): build the centroid + cell-partitioned
    // assignment artifact ONCE, then probe it — recall must match the
    // inline ivfTopK (identical deterministic centroids) and the probe
    // scan must read ∝ nprobe/cells of the assignment bytes.
    val idxPath = java.nio.file.Files
      .createTempDirectory("annprobe_ivf").toString + "/index"
    val ((cents, assigned), buildWall) = timed {
      graft.ops.IvfIndex.buildOrLoadWithAssignments(spark, emb, 16, idxPath)
    }
    val (ivfpHits, ivfpWall) = timed {
      Similarity.ivfTopKProbed(cents, assigned, queries, k = 5, nprobe = 4)
        .select("qid", "vid").intersect(exact5).count()
    }
    // byte accounting on a single-query probe — the shape where pruning
    // is visible (a broad query batch can legitimately touch every
    // cell: 20 queries x 4 probed cells can cover all 16)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val oneQ = Similarity.ivfTopKProbed(cents, assigned,
      emb.filter(col("vec_id") === 0), k = 5, nprobe = 4)
    oneQ.count()
    // headOption (round-14 advice): a plan-shape change under AQE or a
    // relocated assignment path must degrade to "bytes unavailable",
    // not kill the whole probe run after the expensive index build
    val assignScanOpt = scans(oneQ.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(_.toString.endsWith(".assign")))
    if (assignScanOpt.isEmpty) System.err.println(
      "[annprobe] WARNING: no FileSourceScanExec over a .assign path in " +
        "the probed plan — byte accounting skipped (plan shape changed?)")
    def dirBytes(parts: Seq[org.apache.spark.sql.execution.datasources.PartitionDirectory]) =
      parts.flatMap(_.files).map(_.getLen).sum
    val (probedBytes, totalBytes) = assignScanOpt.map { assignScan =>
      val static = assignScan.partitionFilters.filterNot(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
      (dirBytes(assignScan.relation.location.listFiles(static, Nil)),
        dirBytes(assignScan.relation.location.listFiles(Nil, Nil)))
    }.getOrElse((-1L, -1L))
    // PQ two-stage (q88): recall is against the exact L2 top-5 (PQ
    // approximates L2, not cosine), so it gets its own truth set
    val exactL2 = {
      import org.apache.spark.sql.expressions.Window
      val c = emb.select(col("vec_id").as("vid"), col("embedding").as("ce"))
        .withColumn("cnorm", Similarity.normSqDecimal(col("ce")))
      val qq = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
        .withColumn("qnorm", Similarity.normSqDecimal(col("qe")))
      val d2 = (col("cnorm") + col("qnorm")) -
        (lit(2.0) * Similarity.dotDecimal(col("qe"), col("ce")))
      val w = Window.partitionBy("qid").orderBy(d2.asc, col("vid"))
      c.join(broadcast(qq), col("qid") =!= col("vid"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
        .select("qid", "vid").localCheckpoint()
    }
    val (pqHits, pqWall) = timed {
      graft.ops.Pq.pqTopK(emb, queries, k = 5)
        .select("qid", "vid").intersect(exactL2).count()
    }
    val (ivfpqHits, ivfpqWall) = timed {
      graft.ops.Pq.ivfpqTopK(emb, queries, k = 5)
        .select("qid", "vid").intersect(exactL2).count()
    }
    val effTables = if (tables > 0) tables else Similarity.tablesForCorpus(n)
    println(f"[annprobe] dir=$dir n=$n queries=$nQ planes=$planes tables=$effTables " +
      f"annRecall=${annHits.toDouble / (nQ * 5)}%.3f annWall=$annWall%.2f " +
      f"ivfRecall=${ivfHits.toDouble / (nQ * 5)}%.3f ivfWall=$ivfWall%.2f " +
      f"ivfProbedRecall=${ivfpHits.toDouble / (nQ * 5)}%.3f ivfProbedWall=$ivfpWall%.2f " +
      f"ivfBuildWall=$buildWall%.2f " +
      f"probedBytes=$probedBytes totalBytes=$totalBytes " +
      f"probedFrac=${if (totalBytes > 0) probedBytes.toDouble / totalBytes else -1.0}%.3f " +
      f"candidates=$cand candWall=$candWall%.2f " +
      f"pqRecall=${pqHits.toDouble / (nQ * 5)}%.3f pqWall=$pqWall%.2f " +
      f"ivfpqRecall=${ivfpqHits.toDouble / (nQ * 5)}%.3f ivfpqWall=$ivfpqWall%.2f")
    spark.stop()
  }
}
