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

  // ── engine-portable (DuckDB-replicable) hash family ──────────────
  // Round-16 verdict item 3: the xxhash64 family has no DuckDB twin,
  // which kept q41b/q41c rows-only. This family is built from the SAME
  // modular Horner fold the q92 CDC oracle already hash-checks
  // (TextAnalysis.fingerprint: acc←7; acc←(acc·31+char)%1e9+7), with
  // per-lane affine transforms h_i(s) = ((2i+1)·base(s) + i·PHI) mod p
  // — an invertible (p prime, 2i+1 coprime) universal-family member
  // per lane, so lanes are pairwise-independent permutations of the
  // base hash and DuckDB restates every value bit-exactly.

  /** Modulus of the portable family (prime, ~2^30 — all products in
    * the affine step stay far inside int64 on both engines). */
  val P: Long = 1000000007L

  /** Per-lane affine offset multiplier (prime; any constant < P). */
  val PHI: Long = 999983L

  /** Portable base hash: base-31 modular Horner fold over UTF-16 char
    * codes — EXACTLY `TextAnalysis.fingerprint`'s arithmetic (Spark
    * `ascii()` = charAt(0) code unit; the oracle's `ascii(c)` per
    * split character agrees on every BMP char). */
  def portableBase(s: UTF8String): Long = {
    val str = s.toString
    var acc = 7L
    var i = 0
    while (i < str.length) {
      acc = (acc * 31L + str.charAt(i).toLong) % P
      i += 1
    }
    acc
  }

  /** Lane `i`'s portable hash of a base value. */
  @inline def lane(base: Long, i: Int): Long =
    ((2L * i + 1L) * base + i * PHI) % P

  /** Portable MinHash signature: same shingling/skip rules as
    * [[minHashCompute]], base hash = [[portableBase]], lane mins over
    * the affine family. */
  def minHashComputePortable(tokens: ArrayData, k: Int,
      numHashes: Int): Array[Long] = {
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
        val base = portableBase(sh) // string folded ONCE
        var s = 0
        while (s < numHashes) {
          val h = lane(base, s)
          if (h < sigs(s)) sigs(s) = h
          s += 1
        }
      }
      i += 1
    }
    if (any) sigs else null
  }

  /** Portable 64-bit SimHash: bit b's ±1 vote per token is the PARITY
    * of lane' hash ((2b+3)·base + b·PHI) mod p — balanced up to 1/p.
    * Same null/skip semantics as [[simHashCompute]]. */
  def simHashComputePortable(tokens: ArrayData): java.lang.Long = {
    val votes = new Array[Int](64)
    var any = false
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null && t.numBytes() > 0) {
        any = true
        val base = portableBase(t)
        var b = 0
        while (b < 64) {
          val h = ((2L * b + 3L) * base + b * PHI) % P
          votes(b) += (if ((h & 1L) == 1L) 1 else -1)
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

  /** Distinct word k-shingles of a token array — the fused kernel
    * behind `Dedup.wordShingles` (round 16): bit-compatible with the
    * composed `array_distinct(transform(sequence, i -> concat_ws(" ",
    * slice(tokens, i, k))))` form (same concat_ws empty-token
    * semantics, same first-occurrence order, empty-string shingles
    * dropped exactly as the `<> ''` filter did), but ArrayTransform is
    * a CodegenFallback — the composed form dropped every shingling
    * consumer (q41d/g/k, q52/q52b) out of whole-stage codegen and
    * built an interpreted expression tree per element. */
  def wordShinglesCompute(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val sep = UTF8String.fromString(" ")
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      val sh = UTF8String.concatWs(sep, parts: _*)
      if (sh != null && sh.numBytes() > 0) seen.add(sh)
      i += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]))
  }

  /** Fused hashing-trick scorer pass: one walk over a token array
    * computing (non-empty token count, Σ weights[portableBase(tok) mod
    * weights.length]) — the feature-hashing inner loop of a linear
    * text scorer (fastText-style quality filter, DSIR importance
    * weighting). No vocabulary relation, no explode, no join: the
    * "model" is a weight ARRAY indexed by the portable hash, so the
    * whole score stage is a map over the corpus whatever the
    * vocabulary size. Returns null when no token contributes (mirrors
    * the explode-formulation's groupBy dropping the doc). Weight sums
    * are exact int64 — order-independent, so the fused result is
    * bit-identical to the explode+join restatement the oracle runs. */
  def bucketWeightSum(tokens: ArrayData, weights: Array[Long]): Array[Long] = {
    val d = weights.length
    var cnt = 0L
    var sum = 0L
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null && t.numBytes() > 0) {
        cnt += 1
        sum += weights((portableBase(t) % d).toInt)
      }
      i += 1
    }
    if (cnt == 0) null else Array(cnt, sum)
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

/** Portable-family twin of [[MinHashSigs]] (Horner-fold base + affine
  * lanes — every signature value DuckDB-replicable). */
case class MinHashSigsPortable(child: Expression, k: Int, numHashes: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val r = TextHashes.minHashComputePortable(a.asInstanceOf[ArrayData], k, numHashes)
    if (r == null) null else new GenericArrayData(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val r = ctx.freshName("sigs")
      s"""
         |long[] $r = graft.functions.TextHashes.minHashComputePortable($x, $k, $numHashes);
         |if ($r == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($r);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigsPortable =
    copy(child = newChild)
  override def prettyName: String = "minhash_sigs_portable"
}

object MinHashSigsPortable {
  def apply(tokens: Column, k: Int, numHashes: Int): Column =
    GraftBridge.column(
      MinHashSigsPortable(GraftBridge.expression(tokens), k, numHashes))
}

/** `array<string>` tokens → `array<bigint>` [n_tokens, Σ weight] via
  * [[TextHashes.bucketWeightSum]] — the weight array rides the
  * expression as a codegen reference object (the PqCodes discipline:
  * corpus- or formula-derived model parameters become literals, the
  * scoring pass stays a pure map inside whole-stage codegen). */
case class BucketWeightSum(child: Expression, weights: Array[Long])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null when no token contributes

  override def nullSafeEval(a: Any): Any = {
    val r = TextHashes.bucketWeightSum(a.asInstanceOf[ArrayData], weights)
    if (r == null) null else new GenericArrayData(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", weights, "long[]")
    nullSafeCodeGen(ctx, ev, x => {
      val r = ctx.freshName("bws")
      s"""
         |long[] $r = graft.functions.TextHashes.bucketWeightSum($x, $wRef);
         |if ($r == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($r);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BucketWeightSum =
    copy(child = newChild)
  override def prettyName: String = "bucket_weight_sum"
}

object BucketWeightSum {
  def apply(tokens: Column, weights: Array[Long]): Column =
    GraftBridge.column(
      BucketWeightSum(GraftBridge.expression(tokens), weights))
}

/** `array<string>` tokens → `array<string>` distinct k-shingles via
  * [[TextHashes.wordShinglesCompute]]. */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    TextHashes.wordShinglesCompute(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextHashes.wordShinglesCompute($x, $k);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

object WordShingles {
  def apply(tokens: Column, k: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(tokens), k))
}

/** `string` → portable Horner-fold base hash ([[TextHashes
  * .portableBase]]) as ONE native kernel call — bit-identical to the
  * composed HOF fold (`TextAnalysis.fingerprint` = aggregate over
  * split("") chars) but without materializing a per-char array per
  * value: the q97 gram stage hashes ~L× the corpus token count, where
  * the char-array garbage of the HOF form is the dominant cost. */
case class PortableHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    TextHashes.portableBase(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextHashes.portableBase($x);")

  override protected def withNewChildInternal(newChild: Expression): PortableHash =
    copy(child = newChild)
  override def prettyName: String = "portable_hash"
}

object PortableHash {
  def apply(s: Column): Column =
    GraftBridge.column(PortableHash(GraftBridge.expression(s)))
}

/** Portable-family twin of [[SimHash64]] (per-bit votes from lane
  * parities of the Horner-fold base — DuckDB-replicable). */
case class SimHash64Portable(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    TextHashes.simHashComputePortable(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val r = ctx.freshName("sh")
      s"""
         |java.lang.Long $r = graft.functions.TextHashes.simHashComputePortable($x);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64Portable =
    copy(child = newChild)
  override def prettyName: String = "simhash64_portable"
}

object SimHash64Portable {
  def apply(tokens: Column): Column =
    GraftBridge.column(SimHash64Portable(GraftBridge.expression(tokens)))
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
