package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import scala.jdk.CollectionConverters._

/** R20 — observability (config/logging.py:1-16, the reference's
  * structured stdout logging + Datadog shipping), Spark-first: a
  * `QueryExecutionListener` records one structured line per executed
  * action — query tag, wall-clock, output rows when the sink exposes
  * them, and failures with their cause — to the log4j2 stream any
  * collector (Datadog, fluentd, CloudWatch) tails, plus an in-process
  * ring the engine's own harnesses (and ObservabilitySpec) can read.
  * The Spark UI / metrics system continues to cover executor-level
  * telemetry; this listener is the per-query envelope the reference
  * printed per wallet fetch/load.
  */
object Observability {

  /** One executed action: `relations` are the leaf tables/files the
    * plan read (the per-query provenance the reference logged per
    * wallet), duration is end-to-end for the action. */
  final case class QueryMetric(relations: Seq[String], funcName: String,
      durationMs: Long, outputRows: Option[Long], error: Option[String])

  private val ring = new ConcurrentLinkedQueue[QueryMetric]
  private val maxEntries = 1024

  private def record(m: QueryMetric): Unit = {
    ring.add(m)
    while (ring.size > maxEntries) ring.poll() // bounded: no driver leak
  }

  /** Metrics recorded so far (oldest first, bounded ring). */
  def metrics: Seq[QueryMetric] = ring.iterator().asScala.toSeq

  def clear(): Unit = ring.clear()

  private def outputRows(qe: QueryExecution): Option[Long] =
    qe.executedPlan.metrics.get("numOutputRows").map(_.value)

  private val log = org.slf4j.LoggerFactory.getLogger("graft.Observability")

  /** Leaf relations of the analyzed plan: catalog table names where
    * known, else the relation's short description (file scans show
    * their location). */
  private def relations(qe: QueryExecution): Seq[String] =
    qe.analyzed.collectLeaves().map {
      case r: org.apache.spark.sql.catalyst.catalog.HiveTableRelation =>
        r.tableMeta.qualifiedName
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.catalogTable.map(_.qualifiedName).getOrElse(l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.take(2).mkString(",").takeRight(120)
          case other => other.toString.take(120)
        })
      case other => other.simpleString(1).take(120)
    }.distinct

  private final class Listener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = {
      val m = QueryMetric(relations(qe), funcName, durationNs / 1000000L,
        outputRows(qe), None)
      record(m)
      log.info(s"graft.query fn=$funcName ms=${m.durationMs} " +
        s"rows=${m.outputRows.getOrElse(-1L)} status=ok " +
        s"relations=${m.relations.mkString(",")}")
    }

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = {
      val m = QueryMetric(relations(qe), funcName, -1L, None,
        Some(String.valueOf(exception.getMessage)))
      record(m)
      log.warn(s"graft.query fn=$funcName status=failed " +
        s"error=${m.error.get} relations=${m.relations.mkString(",")}")
    }
  }

  /** Idempotent per-session registration. */
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean])

  def register(spark: SparkSession): Unit =
    if (registered.put(spark, java.lang.Boolean.TRUE) == null)
      spark.listenerManager.register(new Listener)
}
