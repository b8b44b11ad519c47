package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Canonicalization helpers shared by every declared query so results
  * hash-match the DuckDB oracle (FIXTURES.md §3).
  *
  * Discipline: floating-point aggregation order differs between engines
  * (and between Spark runs — partial-aggregate combine order is
  * nondeterministic across partitions), so every SUM over doubles is
  * computed in exact decimal arithmetic (order-independent) and only
  * converted to double at the output boundary. Derived float outputs
  * (avg, stddev, cosine) are then computed with the *identical* IEEE
  * double expression tree on both engines — identical inputs + identical
  * correctly-rounded ops (+ - * / sqrt) → bit-identical outputs.
  * Timestamps are rendered as `yyyy-MM-dd HH:mm:ss` UTC strings (the
  * reference's own render, walletDataConsumer.py:96).
  */
object Canon {
  /** Exact-decimal working type for monetary sums: scale 6 absorbs any
    * double-rounding noise; 22 integer digits covers 1e14-magnitude sums. */
  val Money: DecimalType = DecimalType(28, 6)
  /** Narrower type used on multiply inputs so the product stays within
    * decimal(38,_): (18,6) × (18,6) → (37,12). */
  val MoneyIn: DecimalType = DecimalType(18, 6)

  /** Exact (order-independent) SUM of a double column, as double. */
  def dsumExact(c: Column): Column = sum(c.cast(Money)).cast("double")

  /** Canonical SUM of a double column (rounded to the 6-dp boundary). */
  def dsum(c: Column): Column = round(dsumExact(c), 6)

  /** Canonical AVG: exact decimal sum → double, one IEEE division. */
  def davg(c: Column): Column = round(dsumExact(c) / count(c), 6)

  /** Exact sum of squares (for variance/stddev/norms), as double. */
  def dsumSqExact(c: Column): Column =
    sum(c.cast(MoneyIn) * c.cast(MoneyIn)).cast("double")

  /** Sample variance from exact sums — identical double ops both engines. */
  def dvarSamp(c: Column): Column = {
    val n = count(c).cast("double")
    round((dsumSqExact(c) - dsumExact(c) * dsumExact(c) / n) / (n - lit(1.0)), 6)
  }

  /** Sample stddev from exact sums. */
  def dstddevSamp(c: Column): Column = {
    val n = count(c).cast("double")
    round(sqrt((dsumSqExact(c) - dsumExact(c) * dsumExact(c) / n) / (n - lit(1.0))), 6)
  }

  /** TPC-H-style revenue: SUM(extendedprice * (1 - discount)) in exact
    * decimal: (18,2) × (8,2) → (27,4), summed exactly. */
  def revenue(ext: Column, disc: Column): Column =
    round(sum(ext.cast(DecimalType(18, 2)) * (lit(1) - disc).cast(DecimalType(8, 2)))
      .cast("double"), 6)

  /** Timestamp → canonical UTC string (second precision). */
  def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Round a double output column to the 6-dp boundary. */
  def r6(c: Column): Column = round(c, 6)

  /** DuckDB fragments computing the identical canonical expressions. */
  object sql {
    def dsumExact(x: String): String =
      s"CAST(SUM(CAST($x AS DECIMAL(28,6))) AS DOUBLE)"
    def dsum(x: String): String = s"ROUND(${dsumExact(x)}, 6)"
    def davg(x: String): String = s"ROUND(${dsumExact(x)} / COUNT($x), 6)"
    def dsumSqExact(x: String): String =
      s"CAST(SUM(CAST($x AS DECIMAL(18,6)) * CAST($x AS DECIMAL(18,6))) AS DOUBLE)"
    def dvarSamp(x: String): String =
      s"ROUND((${dsumSqExact(x)} - ${dsumExact(x)} * ${dsumExact(x)} / CAST(COUNT($x) AS DOUBLE)) / (CAST(COUNT($x) AS DOUBLE) - 1.0), 6)"
    def dstddevSamp(x: String): String =
      s"ROUND(sqrt((${dsumSqExact(x)} - ${dsumExact(x)} * ${dsumExact(x)} / CAST(COUNT($x) AS DOUBLE)) / (CAST(COUNT($x) AS DOUBLE) - 1.0)), 6)"
    def revenue(ext: String, disc: String): String =
      s"ROUND(CAST(SUM(CAST($ext AS DECIMAL(18,2)) * CAST(1 - $disc AS DECIMAL(8,2))) AS DOUBLE), 6)"
    def tsStr(x: String): String = s"strftime($x, '%Y-%m-%d %H:%M:%S')"
    def r6(x: String): String = s"ROUND($x, 6)"
  }
}
