package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused PQ encoder: `array<float|double>` embedding → `array<int>` of
  * M per-subspace codes, as ONE compact kernel call.
  *
  * Semantics are IDENTICAL to the composed formulation (per subspace:
  * argmin over codebook literals of `(‖x_m‖² − 2·⟨x_m, c⟩) + ‖c‖²`
  * with DecimalDot's per-term decimal(23,14) rounding, ties to the
  * smallest code — `Pq.bestCode`'s array_sort-over-structs tree). The
  * composed form expands to M×K inline decimal dots (256 here), whose
  * generated whole-stage code exceeds janino's 64 KB method limit and
  * silently falls back to interpreted evaluation over the WHOLE
  * CORPUS — the PQ family's measured hot spot. This kernel keeps the
  * encode inside whole-stage codegen as a single monomorphic loop:
  * per subspace, one norm pass + K literal dots on primitive reads,
  * no struct allocation, no sort.
  */
case class PqCodes(child: Expression,
    cb: Seq[(Int, Int, Array[Double], Double)], m: Int, subDim: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private def isFloatArr: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"pq_codes expects array<float|double>, got $other")
  }

  // per-subspace codebooks, code-ascending (tie-break order)
  @transient private lazy val codes: Array[Array[Int]] =
    Array.tabulate(m)(mm => cb.collect { case (`mm`, c, _, _) => c }.sorted.toArray)
  @transient private lazy val cents: Array[Array[Array[Double]]] =
    Array.tabulate(m) { mm =>
      cb.collect { case (`mm`, c, v, _) => (c, v) }.sortBy(_._1).map(_._2).toArray
    }
  @transient private lazy val norms: Array[Array[Double]] =
    Array.tabulate(m) { mm =>
      cb.collect { case (`mm`, c, _, n) => (c, n) }.sortBy(_._1).map(_._2).toArray
    }

  /** Decimal-exact dot of the subspace slice [off, off+n) with a
    * literal — DecimalDot.compute's arithmetic on a slice. */
  private[functions] def dotSliceJava(x: ArrayData, xF: Boolean, off: Int,
      lit: Array[Double]): Double = {
    val n = lit.length
    var acc = 0L
    var i = 0
    while (i < n) {
      val xv = if (xF) x.getFloat(off + i).toDouble else x.getDouble(off + i)
      val v = xv * lit(i)
      if (!(Math.abs(v) <= Fixed14.MaxSafe)) return dotSliceExact(x, xF, off, lit)
      acc += Fixed14.round14(v)
      i += 1
    }
    Fixed14.toDouble(acc)
  }

  private def dotSliceExact(x: ArrayData, xF: Boolean, off: Int,
      lit: Array[Double]): Double = {
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < lit.length) {
      val xv = if (xF) x.getFloat(off + i).toDouble else x.getDouble(off + i)
      acc = acc.add(java.math.BigDecimal.valueOf(xv * lit(i))
        .setScale(14, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    acc.doubleValue()
  }

  private[functions] def normSliceJava(x: ArrayData, xF: Boolean, off: Int,
      n: Int): Double = {
    var acc = 0L
    var i = 0
    while (i < n) {
      val xv = if (xF) x.getFloat(off + i).toDouble else x.getDouble(off + i)
      val v = xv * xv
      if (!(v <= Fixed14.MaxSafe)) return normSliceExact(x, xF, off, n)
      acc += Fixed14.round14(v)
      i += 1
    }
    Fixed14.toDouble(acc)
  }

  private def normSliceExact(x: ArrayData, xF: Boolean, off: Int, n: Int): Double = {
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      val xv = if (xF) x.getFloat(off + i).toDouble else x.getDouble(off + i)
      acc = acc.add(java.math.BigDecimal.valueOf(xv * xv)
        .setScale(14, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    acc.doubleValue()
  }

  /** The kernel: one int code per subspace. Public (and Java-callable)
    * for the generated code path. */
  def encodeJava(x: ArrayData): ArrayData = {
    val xF = isFloatArr
    val out = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      val off = mm * subDim
      // same fixed IEEE tree as Pq.d2: (‖x‖² − (2·⟨x,c⟩)) + ‖c‖²
      val sn = normSliceJava(x, xF, off, subDim)
      val cs = codes(mm); val cv = cents(mm); val cn = norms(mm)
      var best = 0
      var bestD = Double.PositiveInfinity
      var k = 0
      while (k < cs.length) {
        val d = (sn - (2.0 * dotSliceJava(x, xF, off, cv(k)))) + cn(k)
        if (d < bestD) { bestD = d; best = cs(k) } // strict <: ties keep the smaller code
        k += 1
      }
      out(mm) = best
      mm += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = encodeJava(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodes", this, classOf[PqCodes].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.encodeJava($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
  override def prettyName: String = "pq_codes"
}

object PqCodes {
  def apply(emb: Column, cb: Seq[(Int, Int, Array[Double], Double)],
      m: Int, subDim: Int): Column =
    GraftBridge.column(PqCodes(GraftBridge.expression(emb), cb, m, subDim))
}

/** Fused ADC-table builder: `array<float|double>` query embedding (or
  * residual) → `array<array<decimal(23,14)>>` — M tables of K entries,
  * entry (m, k) = d²(x_m, c_{m,k}) cast to decimal(23,14) HALF_UP,
  * bit-identical to the composed `d2(...).cast(DecimalType(23,14))`
  * trees (same Double.toString-based valueOf + setScale rounding that
  * Spark's Cast applies). Same 64 KB-codegen rationale as [[PqCodes]];
  * this stage is query-side (small rows) so the win is mostly a clean
  * whole-stage plan rather than wall time. */
case class PqAdcTables(child: Expression,
    cb: Seq[(Int, Int, Array[Double], Double)], m: Int, subDim: Int)
  extends UnaryExpression {

  private val dec = DecimalType(23, 14)
  override def dataType: DataType =
    ArrayType(ArrayType(dec, containsNull = false), containsNull = false)
  override def nullable: Boolean = child.nullable

  private def isFloatArr: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"pq_adc_tables expects array<float|double>, got $other")
  }

  @transient private lazy val cents: Array[Array[Array[Double]]] =
    Array.tabulate(m) { mm =>
      cb.collect { case (`mm`, c, v, _) => (c, v) }.sortBy(_._1).map(_._2).toArray
    }
  @transient private lazy val norms: Array[Array[Double]] =
    Array.tabulate(m) { mm =>
      cb.collect { case (`mm`, c, _, n) => (c, n) }.sortBy(_._1).map(_._2).toArray
    }
  @transient private lazy val helper =
    PqCodes(child, cb, m, subDim) // reuse its slice-dot kernels

  def tablesJava(x: ArrayData): ArrayData = {
    val xF = isFloatArr
    val out = new Array[ArrayData](m)
    var mm = 0
    while (mm < m) {
      val off = mm * subDim
      val sn = helper.normSliceJava(x, xF, off, subDim)
      val cv = cents(mm); val cn = norms(mm)
      val row = new Array[Any](cv.length)
      var k = 0
      while (k < cv.length) {
        val d = (sn - (2.0 * helper.dotSliceJava(x, xF, off, cv(k)))) + cn(k)
        val bd = java.math.BigDecimal.valueOf(d)
          .setScale(14, java.math.RoundingMode.HALF_UP)
        row(k) =
          if (bd.precision > 23) null
          else org.apache.spark.sql.types.Decimal(bd)
        k += 1
      }
      out(mm) = new GenericArrayData(row)
      mm += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(a: Any): Any = tablesJava(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcTables].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.tablesJava($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcTables =
    copy(child = newChild)
  override def prettyName: String = "pq_adc_tables"
}

object PqAdcTables {
  def apply(emb: Column, cb: Seq[(Int, Int, Array[Double], Double)],
      m: Int, subDim: Int): Column =
    GraftBridge.column(PqAdcTables(GraftBridge.expression(emb), cb, m, subDim))
}
