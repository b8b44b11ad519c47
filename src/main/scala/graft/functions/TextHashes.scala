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
  // Round-16 verdict item 3 introduced a portable family so q41b/q41c
  // could be duck-oracled; round 17 REPLACES its lane construction.
  // The v1 lanes were affine images of ONE Horner fold — h_i(s) =
  // ((2i+1)·base(s) + i·PHI) mod p — which made them massively
  // correlated: a shingle whose base is small stays minimal in EVERY
  // MinHash lane (est_jaccard bimodal, sd ≈ 0.46 at J=0.8 vs ≈ 0.09
  // independent), and SimHash bit votes were parities of an arithmetic
  // progression (~15% of unrelated docs landed at Hamming ≤ 3,
  // including 0). The verdicts were deterministic and oracle-matched —
  // both engines computed the same wrong thing.
  //
  // v2 (this family): TWO independently-seeded Horner folds
  // B1(s) = fold(seed 7,  mult 31)  mod p
  // B2(s) = fold(seed 13, mult 131) mod p
  // and per-lane hashes  h_i(s) = (A_i·B1 + C_i·B2) mod p  with FIXED
  // pseudorandom constants (A_i, C_i) ∈ [1, p)² (splitmix64 expansion
  // of a pinned seed — deterministic, shared verbatim by the kernel
  // and the DuckDB SQL emission). For lanes i ≠ j the map (B1,B2) →
  // (h_i,h_j) is the linear map [[A_i,C_i],[A_j,C_j]] over Z_p; its
  // determinant is verified ≠ 0 mod p at class init for every lane
  // pair, so the map is a bijection of (Z_p)² and (h_i,h_j) is uniform
  // whenever (B1,B2) is — pairwise independent ASSUMING the two folds
  // behave as independent uniform hashes of the shingle. That premise
  // is heuristic (B1, B2 are two Horner folds of the same string, not
  // formally independent); the guarantee here is the determinant check
  // plus the measured statistics, not a theorem. Measured (and
  // REPRODUCIBLE from the repo — HashFamilySpec pins all three on a
  // deterministic fixture): unrelated docs min Hamming 13 on a
  // shared-vocab corpus (17 on the disjoint-vocab simulation shape;
  // 0% at ≤3 either way), unrelated MinHash zero band collisions,
  // identical docs est_jaccard exactly 1.0 with near-dup estimates
  // concentrated (v1 was bimodal, sd ≈ 0.46). All products stay under
  // (p-1)² + (p-1)² < 2^62 — exact int64 on both engines.

  /** Modulus of the portable family (prime, ~2^30 — all products in
    * the lane step stay far inside int64 on both engines). */
  val P: Long = 1000000007L

  /** Second-fold seed / multiplier (B2 = fold(13, 131)). */
  val Seed2: Long = 13L
  val Mult2: Long = 131L

  private def splitmixPairs(seed: Long, n: Int): (Array[Long], Array[Long]) = {
    var x = seed
    def next(): Long = {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      java.lang.Long.remainderUnsigned(z, P - 1) + 1
    }
    val a = Array.fill(n)(next())
    // fill order matters: all A's first, then all C's, pinned by the
    // local simulation that validated the family
    (a, Array.fill(n)(next()))
  }
  private def requireInvertible(a: Array[Long], c: Array[Long], fam: String): Unit = {
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) {
        require(Math.floorMod(a(i) * c(j) - a(j) * c(i), P) != 0L,
          s"$fam lanes $i/$j not pairwise independent — change the seed")
        j += 1
      }
      i += 1
    }
  }

  /** MinHash lane constants (32 lanes, seed "minh"). */
  val (mhA, mhC) = splitmixPairs(0x6d696e68L, 32)
  /** SimHash bit constants (64 bits, seed "simh"). */
  val (shA, shC) = splitmixPairs(0x73696d68L, 64)
  requireInvertible(mhA, mhC, "minhash")
  requireInvertible(shA, shC, "simhash")

  /** Portable base hash: base-31 modular Horner fold over Unicode CODE
    * POINTS — the arithmetic of `TextAnalysis.fingerprint` with the
    * oracle's exact character model (DuckDB `string_split(s,'')` +
    * `ascii(c)` iterate code points, so supplementary-plane text —
    * emoji, CJK extensions — folds identically on both engines;
    * UTF-16-unit iteration silently diverged there). */
  def portableBase(s: UTF8String): Long = {
    val str = s.toString
    var acc = 7L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** Both Horner folds in one pass over the code points, packed as
    * (B1 << 31) | B2 (each < 2^30 — the pack is lossless and doubles
    * as the signature-cache key). */
  def foldBases(s: UTF8String): Long = {
    val str = s.toString
    var a = 7L
    var c = Seed2
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      a = (a * 31L + cp) % P
      c = (c * Mult2 + cp) % P
      i += Character.charCount(cp)
    }
    (a << 31) | c
  }

  /** Lane `i`'s portable MinHash value from the packed fold pair. */
  @inline def mhLane(packed: Long, i: Int): Long =
    (mhA(i) * (packed >>> 31) + mhC(i) * (packed & 0x7FFFFFFFL)) % P

  /** Portable MinHash signature: same shingling/skip rules as
    * [[minHashCompute]]; both folds computed in one pass per shingle,
    * lane mins over the two-fold pairwise-independent family. */
  def minHashComputePortable(tokens: ArrayData, k: Int,
      numHashes: Int): Array[Long] = {
    require(numHashes <= mhA.length, s"at most ${mhA.length} portable lanes")
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
        val packed = foldBases(sh) // string folded ONCE (both bases)
        val b1 = packed >>> 31
        val b2 = packed & 0x7FFFFFFFL
        var s = 0
        while (s < numHashes) {
          val h = (mhA(s) * b1 + mhC(s) * b2) % P
          if (h < sigs(s)) sigs(s) = h
          s += 1
        }
      }
      i += 1
    }
    if (any) sigs else null
  }

  /** Packed 64-bit parity signature of one fold pair — bit b set iff
    * (A_b·B1 + C_b·B2) mod p is odd. */
  private def simSigOf(packed: Long): Long = {
    val b1 = packed >>> 31
    val b2 = packed & 0x7FFFFFFFL
    var sig = 0L
    var b = 0
    while (b < 64) {
      if ((((shA(b) * b1 + shC(b) * b2) % P) & 1L) == 1L) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Per-thread direct-mapped (fold-pair → parity signature) cache.
    * The signature is a pure function of the PACKED FOLD PAIR, so a
    * rare slot eviction only costs a recompute — never a wrong value —
    * and correctness needs no collision argument. Token frequency is
    * Zipf-shaped, so the 64-lane arithmetic runs ~once per distinct
    * token per thread instead of once per occurrence: the round-16
    * kernel's 64 mod-muls per OCCURRENCE were the q41c 5× wall. */
  private final class SimSigCache {
    private val bits = 15
    private val mask = (1 << bits) - 1
    private val keys = new Array[Long](1 << bits) // packed+1; 0 = empty
    private val vals = new Array[Long](1 << bits)
    def get(packed: Long): Long = {
      var h = packed * -7046029254386353131L // splitmix odd constant
      h ^= (h >>> 32)
      val idx = (h & mask).toInt
      if (keys(idx) == packed + 1) vals(idx)
      else {
        val s = simSigOf(packed)
        keys(idx) = packed + 1
        vals(idx) = s
        s
      }
    }
  }
  private val simCache = new ThreadLocal[SimSigCache] {
    override def initialValue(): SimSigCache = new SimSigCache
  }

  /** Portable 64-bit SimHash: bit b's ±1 vote per token is the parity
    * of (A_b·B1 + C_b·B2) mod p — balanced up to 1/p, pairwise-
    * independent across bits. Same null/skip semantics as
    * [[simHashCompute]]; per-distinct-token signatures come from the
    * thread-local cache, so the hot loop per occurrence is two Horner
    * folds plus 64 shift-mask vote adds. */
  def simHashComputePortable(tokens: ArrayData): java.lang.Long = {
    val votes = new Array[Int](64)
    var any = false
    val cache = simCache.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null && t.numBytes() > 0) {
        any = true
        val sig = cache.get(foldBases(t))
        var b = 0
        while (b < 64) {
          votes(b) += ((((sig >>> b) & 1L).toInt << 1) - 1)
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

  // fail at plan construction, not per-row: the portable family has a
  // fixed pinned lane table (generating more lanes would change the
  // cross-engine contract, so a larger ask is a caller bug)
  require(numHashes > 0 && numHashes <= TextHashes.mhA.length,
    s"portable minhash supports 1..${TextHashes.mhA.length} lanes, got $numHashes")

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
