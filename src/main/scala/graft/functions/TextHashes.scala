package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused map-only kernels for the hash-based dedup family (Q41b/c).
  *
  * The composed forms explode tokens/shingles (200× row inflation),
  * aggregate per doc, and — for MinHash — rehash every shingle STRING
  * once per hash lane (`xxhash64(shingle, lit(i))` recomputes the
  * string hash for each i). These expressions keep the whole
  * computation inside one row: shingling, hashing, and all lanes in a
  * single pass — zero row inflation, zero aggregation shuffle, one
  * string hash per shingle. At 100 TB the signature stage becomes a
  * pure map over the corpus.
  *
  * Bit-compat: both reproduce Spark's `xxhash64` chain exactly
  * (seed 42; multi-arg fold `hash(arg_n, …hash(arg_0, 42))`), so
  * outputs are identical to the composed forms — DedupSpec asserts
  * equality on the fixture corpus.
  */
object TextHashes {

  /** MinHash signature of a token array: shingles = concat_ws(" ") of
    * every k consecutive tokens (empty shingles skipped, duplicates
    * harmless — min over a multiset equals min over its set);
    * sig(s) = min over shingles of xxhash64(shingle, s). Null when no
    * shingle contributes (doc absent from the composed groupBy). */
  def minHashCompute(tokens: ArrayData, k: Int, numHashes: Int): Array[Long] = {
    val n = tokens.numElements()
    if (n < k) return null
    val sigs = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    val sep = UTF8String.fromString(" ")
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      val sh = UTF8String.concatWs(sep, parts: _*)
      if (sh != null && sh.numBytes() > 0) {
        any = true
        val h1 = XxHash64Function.hash(sh, StringType, 42L) // string hashed ONCE
        var s = 0
        while (s < numHashes) {
          val h = XXH64.hashInt(s, h1) // = xxhash64(shingle, lit(s))
          if (h < sigs(s)) sigs(s) = h
          s += 1
        }
      }
      i += 1
    }
    if (any) sigs else null
  }

  /** 64-bit SimHash of a token array: per-bit ±1 votes of
    * xxhash64(token) over non-empty tokens; bit set iff votes > 0.
    * Null when no token contributes (mirrors SimHashAgg semantics). */
  def simHashCompute(tokens: ArrayData): java.lang.Long = {
    val votes = new Array[Int](64)
    var any = false
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null && t.numBytes() > 0) {
        any = true
        val h = XxHash64Function.hash(t, StringType, 42L)
        var b = 0
        while (b < 64) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    if (!any) return null
    var r = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) r |= 1L << b; b += 1 }
    java.lang.Long.valueOf(r)
  }
}

/** `array<string>` tokens → `array<bigint>` MinHash signature. */
case class MinHashSigs(child: Expression, k: Int, numHashes: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null when no shingle contributes

  override def nullSafeEval(a: Any): Any = {
    val r = TextHashes.minHashCompute(a.asInstanceOf[ArrayData], k, numHashes)
    if (r == null) null else new GenericArrayData(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val r = ctx.freshName("sigs")
      s"""
         |long[] $r = graft.functions.TextHashes.minHashCompute($x, $k, $numHashes);
         |if ($r == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($r);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
  override def prettyName: String = "minhash_sigs"
}

object MinHashSigs {
  def apply(tokens: Column, k: Int, numHashes: Int): Column =
    GraftBridge.column(MinHashSigs(GraftBridge.expression(tokens), k, numHashes))
}

/** `array<string>` tokens → packed 64-bit SimHash. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true // null when no token contributes

  override def nullSafeEval(a: Any): Any =
    TextHashes.simHashCompute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val r = ctx.freshName("sh")
      s"""
         |java.lang.Long $r = graft.functions.TextHashes.simHashCompute($x);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object SimHash64 {
  def apply(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))
}
