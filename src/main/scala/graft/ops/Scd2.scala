package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimension-maintenance operators over a change feed — the MERGE
  * surface of the warehouse the reference loads into
  * (resources/redshift.py:89-112 presumes a maintained warehouse
  * table; the reference itself only ever full-refreshes, q46). Both
  * operators take an append-only feed of (key, attributes, effective
  * timestamp) versions — the shape a CDC stream lands in — and need
  * no table format support: history and snapshot are pure relational
  * derivations, re-runnable idempotently at any scale.
  */
object Scd2 {

  /** Type-2 history: each version's validity interval is
    * [its effective ts, the key's NEXT effective ts), open-ended for
    * the latest version (`is_current`). One shuffle on the key; the
    * per-key window buffers only that key's version count (dimension
    * version chains are short — bounded memory at any corpus size). */
  def history(changes: DataFrame, keyCol: String, effCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(effCol)
    changes
      .withColumn("valid_to_ts", lead(col(effCol), 1).over(w))
      .withColumn("is_current",
        when(col("valid_to_ts").isNull, 1L).otherwise(0L))
  }

  /** Latest-wins snapshot (CDC upsert apply): the current state after
    * replaying the feed. Deliberately `max(struct(eff, attrs…))`
    * rather than a row_number window: an AGGREGATE gets a partial +
    * final pair (struct buffers aren't HashAggregate-mutable, so both
    * halves plan as SortAggregate — but the sorts are task-LOCAL, by
    * grouping key), and the map-side partial collapses each task to at
    * most one row per key BEFORE the exchange. The window formulation
    * instead shuffles the ENTIRE feed and sorts every key group on the
    * reduce side — the difference between shuffling keys and shuffling
    * a 100 TB changelog. Lexicographic struct ordering means `effCol`
    * (the leading field) decides; it must be unique per key (a CDC
    * log's LSN/ts is), attrs only break impossible ties. */
  def latest(changes: DataFrame, keyCol: String, effCol: String,
      attrCols: Seq[String]): DataFrame = {
    val payload = struct((effCol +: attrCols).map(col): _*)
    changes.groupBy(col(keyCol))
      .agg(max(payload).as("_r"))
      .select(col(keyCol) +: (attrCols :+ effCol).map(c => col(s"_r.$c").as(c)): _*)
  }
}
