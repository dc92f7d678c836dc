package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the hot per-row signature math of the
  * dedup/similarity operators. The Column-DSL formulations (64 interpreted
  * `aggregate`/`transform` passes per row) dominate the benchmark; a single
  * tight JVM loop per row is 1-2 orders faster and keeps the surrounding
  * plan codegen-friendly (one opaque call vs. a forest of lambda nodes).
  */
object HashExprs {

  /** 64-bit SimHash over an array of 64-bit token hashes: bit i of the
    * signature is set iff the count of inputs with bit i set exceeds half.
    * Null elements are ignored.
    */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    protected override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Int](64)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = arr.getLong(i)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        i += 1
      }
      var sig = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
      java.lang.Long.valueOf(sig)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.HashExprs.simhash64Eval($c)")

    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  }

  /** Codegen entry point for [[SimHash64]]. */
  def simhash64Eval(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** k-entry MinHash signature over an array of element hashes, using the
    * classic universal family g_j(x) = a_j·mix(x) + b_j (odd a_j, seeded,
    * wrapping arithmetic) with a finalizer mix so nearby inputs decorrelate.
    */
  case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"

    protected override def nullSafeEval(input: Any): Any =
      new GenericArrayData(
        MinHashSig.signature(input.asInstanceOf[ArrayData], k))

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.functions.HashExprs.minhashSigEval($c, $k))")

    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  }

  /** Codegen entry point for [[MinHashSig]] (static forwarders only exist
    * on the top-level object). */
  def minhashSigEval(arr: ArrayData, k: Int): Array[Long] = MinHashSig.signature(arr, k)

  object MinHashSig {
    private val MaxK = 512
    // deterministic hash-family coefficients, fixed seed
    private val coeffs: Array[(Long, Long)] = {
      val rnd = new scala.util.Random(42L)
      Array.fill(MaxK)((rnd.nextLong() | 1L, rnd.nextLong()))
    }

    @inline private def mix(x0: Long): Long = {
      // splitmix64 finalizer (public domain constant mix)
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }

    def signature(arr: ArrayData, k: Int): Array[Long] = {
      require(k <= MaxK, s"k=$k exceeds $MaxK")
      val n = arr.numElements()
      val mins = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) updateMins(mins, arr.getLong(i), k)
        i += 1
      }
      mins
    }

    /** Fold one element hash into a k-mins buffer (shared with
      * [[MinHashSetAgg]]). */
    def updateMins(mins: Array[Long], x: Long, k: Int): Unit = {
      val m = mix(x)
      var j = 0
      while (j < k) {
        val v = coeffs(j)._1 * m + coeffs(j)._2
        if (v < mins(j)) mins(j) = v
        j += 1
      }
    }
  }

  /** Cosine similarity of two float/double arrays, accumulated in double
    * in element order (parity with the HOF formulation and DuckDB).
    *
    * Mismatched lengths return null (a silent truncation would drop rows
    * through rounded-filter pipelines without surfacing the data problem);
    * a zero-norm vector also returns null (0/0 has no defined cosine).
    */
  /** Cosine similarity over two numeric arrays — the single hottest
    * expression in the repo (every IVF/brute-force/SemDeDup scored pair
    * evaluates it, n·|cells| times per assignment pass), so it is fully
    * codegen'd: `doGenCode` emits a call to the static
    * [[cosineSimEval]] loop with the element types resolved to integer
    * tags at CODEGEN time, keeping the whole scoring stage inside
    * WholeStageCodegen with zero per-row boxing (round 17 — this was
    * the one hot-path CodegenFallback left; measured 20-34% off the
    * five cosine-heavy gates at sf0.1, rested interleave). NULL on length mismatch or a
    * zero-norm side, exactly like the interpreted path — both paths
    * share the one loop, so results are bit-identical. */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "cosine_sim"

    private lazy val leftTag = typeTag(left.dataType.asInstanceOf[ArrayType].elementType)
    private lazy val rightTag = typeTag(right.dataType.asInstanceOf[ArrayType].elementType)

    private def typeTag(t: DataType): Int = t match {
      case FloatType => 0
      case DoubleType => 1
      case IntegerType => 2
      case LongType => 3
      case _ => throw new IllegalArgumentException(s"unsupported element type $t")
    }

    protected override def nullSafeEval(l: Any, r: Any): Any =
      cosineSimEval(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
        leftTag, rightTag)

    override def doGenCode(ctx: CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""
           |java.lang.Double ${ev.value}_r = graft.functions.HashExprs.cosineSimEval(
           |  $a, $b, $leftTag, $rightTag);
           |if (${ev.value}_r == null) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = ${ev.value}_r.doubleValue();
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
      copy(left = l, right = r)
  }

  /** Shared eval loop for [[CosineSim]] (interpreted AND codegen paths —
    * one accumulation order, bit-identical results). Tags: 0=float,
    * 1=double, 2=int, 3=long; the two hot same-type combinations get
    * monomorphic loops, mixed types the generic one. */
  def cosineSimEval(a: ArrayData, b: ArrayData,
      ta: Int, tb: Int): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    if (ta == 0 && tb == 0) {
      var i = 0
      while (i < n) {
        val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
    } else if (ta == 1 && tb == 1) {
      var i = 0
      while (i < n) {
        val x = a.getDouble(i); val y = b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
    } else {
      def get(arr: ArrayData, i: Int, t: Int): Double = t match {
        case 0 => arr.getFloat(i).toDouble
        case 1 => arr.getDouble(i)
        case 2 => arr.getInt(i).toDouble
        case _ => arr.getLong(i).toDouble
      }
      var i = 0
      while (i < n) {
        val x = get(a, i, ta); val y = get(b, i, tb)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Exact integer squared-L2 between two long arrays — the PQ family's
    * kernel (Lloyd assignment at n·m·k grain, pqEncode's m·k argmin per
    * corpus row, the recall gate's exact side), codegen'd like
    * [[CosineSim]] (round 17; Spark's `aggregate`/`zip_with`
    * higher-order encoding of the same sum is interpreted per row).
    * Contract matches the HOF encoding it replaces: NULL on length
    * mismatch or any null element (zip_with pads/poisons), long
    * arithmetic with Java wrap semantics, left-to-right accumulation. */
  case class SqDistLL(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "sq_dist_ll"

    protected override def nullSafeEval(l: Any, r: Any): Any =
      sqDistLLEval(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""
           |java.lang.Long ${ev.value}_r =
           |  graft.functions.HashExprs.sqDistLLEval($a, $b);
           |if (${ev.value}_r == null) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = ${ev.value}_r.longValue();
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDistLL =
      copy(left = l, right = r)
  }

  /** Shared loop for [[SqDistLL]] — interpreted and codegen paths. */
  def sqDistLLEval(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Exact long dot product — quantized rescore (pqRerank stage 2), the
    * PCA projection, and MMR relevance all fold `a*b` over long arrays;
    * same codegen treatment and HOF-matching contract as [[SqDistLL]]. */
  case class DotLL(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "dot_ll"

    protected override def nullSafeEval(l: Any, r: Any): Any =
      dotLLEval(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""
           |java.lang.Long ${ev.value}_r =
           |  graft.functions.HashExprs.dotLLEval($a, $b);
           |if (${ev.value}_r == null) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = ${ev.value}_r.longValue();
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotLL =
      copy(left = l, right = r)
  }

  /** Shared loop for [[DotLL]]. */
  def dotLLEval(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Double dot product over numeric arrays (float/double/int/long —
    * the full [[CosineSim]] tag set; ADVICE r17: the HOF this replaced
    * accepted any castable numeric element, so the kernel must too) —
    * the SRP signature's per-plane projection evaluates this n·nBits
    * times per corpus; the HOF encoding it replaces
    * (`aggregate(zip_with(emb, plane, x·y), 0.0, +)`) is interpreted.
    * Elements widen to double exactly for float/int (and for long the
    * same double rounding the HOF's cast produced), same left-to-right
    * accumulation. */
  case class DotNum(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "dot_num"

    private lazy val leftTag = numTag(left.dataType.asInstanceOf[ArrayType].elementType)
    private lazy val rightTag = numTag(right.dataType.asInstanceOf[ArrayType].elementType)

    private def numTag(t: DataType): Int = t match {
      case FloatType => 0
      case DoubleType => 1
      case IntegerType => 2
      case LongType => 3
      case _ => throw new IllegalArgumentException(s"unsupported element type $t")
    }

    protected override def nullSafeEval(l: Any, r: Any): Any =
      dotNumEval(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
        leftTag, rightTag)

    override def doGenCode(ctx: CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""
           |java.lang.Double ${ev.value}_r = graft.functions.HashExprs.dotNumEval(
           |  $a, $b, $leftTag, $rightTag);
           |if (${ev.value}_r == null) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = ${ev.value}_r.doubleValue();
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotNum =
      copy(left = l, right = r)
  }

  /** Shared loop for [[DotNum]]. Tags: 0=float, 1=double, 2=int,
    * 3=long (the [[cosineSimEval]] tag set). */
  def dotNumEval(a: ArrayData, b: ArrayData,
      ta: Int, tb: Int): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    def get(arr: ArrayData, i: Int, t: Int): Double = t match {
      case 0 => arr.getFloat(i).toDouble
      case 1 => arr.getDouble(i)
      case 2 => arr.getInt(i).toDouble
      case _ => arr.getLong(i).toDouble
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += get(a, i, ta) * get(b, i, tb)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Count of positionally-EQUAL entries between two long arrays — the
    * MinHash signature-agreement kernel behind [[minhash_est_jaccard]]
    * (round 18: the last `aggregate(zip_with(...))` fold swept onto a
    * codegen'd kernel; signature-grain so cold in practice — done for
    * the zero-interpreted-array-folds invariant). Contract matches the
    * HOF it replaces bit-for-bit: positions past the shorter array
    * count 0 (zip_with pads with null and `when(null === …)` falls to
    * `otherwise(0)`), null elements count 0, NULL only when a whole
    * side is NULL. */
  case class EqCountLL(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "eq_count_ll"

    protected override def nullSafeEval(l: Any, r: Any): Any =
      eqCountLLEval(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.HashExprs.eqCountLLEval($a, $b)")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): EqCountLL =
      copy(left = l, right = r)
  }

  /** Shared loop for [[EqCountLL]] — interpreted and codegen paths. */
  def eqCountLLEval(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        acc += 1L
      i += 1
    }
    acc
  }

  /** Per-element `(x − μ)/σ` with `σ == 0 → 0.0` — the standardize map
    * kernel (round-18 sweep): replaces the nested
    * `zip_with(zip_with(vq, mu, x − m), sd, when(s === 0, 0).otherwise(t/s))`
    * pair in `Similarity.standardizeDims`, value-identical INCLUDING
    * the HOF pad semantics: a padded or null position yields a null
    * element — except `σ == 0.0`, which yields 0.0 regardless
    * (`when(s === 0.0, 0.0)` short-circuits the null numerator). `vq`
    * is the quantized-long projection, `mu`/`sd` literal double arrays. */
  case class CenterScale(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
    override def prettyName: String = "center_scale"

    protected override def nullSafeEval(v: Any, m: Any, s: Any): Any =
      centerScaleEval(v.asInstanceOf[ArrayData], m.asInstanceOf[ArrayData],
        s.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (v, m, s) =>
        s"${ev.value} = graft.functions.HashExprs.centerScaleEval($v, $m, $s);")

    override protected def withNewChildrenInternal(f: Expression,
        s: Expression, t: Expression): CenterScale =
      copy(first = f, second = s, third = t)
  }

  /** Shared loop for [[CenterScale]] — interpreted and codegen paths. */
  def centerScaleEval(vq: ArrayData, mu: ArrayData,
      sd: ArrayData): ArrayData = {
    val n = math.max(vq.numElements(),
      math.max(mu.numElements(), sd.numElements()))
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val sOk = i < sd.numElements() && !sd.isNullAt(i)
      if (sOk && sd.getDouble(i) == 0.0) out(i) = 0.0
      else if (sOk && i < vq.numElements() && !vq.isNullAt(i) &&
          i < mu.numElements() && !mu.isNullAt(i))
        out(i) = (vq.getLong(i).toDouble - mu.getDouble(i)) / sd.getDouble(i)
      // else: stays null (pad/poison position, the zip_with contract)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Tokenize on single spaces, hash each token (FNV-1a 64 over UTF-8),
    * combine each n-token window order-sensitively, and return the SORTED
    * distinct shingle hashes — the whole shingle pipeline in one JVM pass
    * (the Column-DSL chain split→filter→transform→concat_ws→slice→distinct
    * built ~300 intermediate strings/arrays per row and dominated the
    * dedup benchmark). Sorted output enables two-pointer set ops
    * ([[SortedJaccard]]).
    */
  case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_hashes"

    protected override def nullSafeEval(input: Any): Any =
      new GenericArrayData(shingleHashesEval(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n))

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.functions.HashExprs.shingleHashesEval($c, $n))")

    override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
  }

  /** Codegen entry point for [[ShingleHashes]]. */
  def shingleHashesEval(text: org.apache.spark.unsafe.types.UTF8String, n: Int): Array[Long] = {
    val bytes = text.getBytes
    // FNV-1a per token, single scan, no String allocation
    val tokenHashes = new java.util.ArrayList[java.lang.Long](64)
    var h = 0xCBF29CE484222325L
    var inToken = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == ' ') {
        if (inToken) { tokenHashes.add(h); h = 0xCBF29CE484222325L; inToken = false }
      } else {
        h = (h ^ (b & 0xFF)) * 0x100000001B3L
        inToken = true
      }
      i += 1
    }
    if (inToken) tokenHashes.add(h)
    val m = tokenHashes.size
    if (m < n) return Array.emptyLongArray
    val out = new Array[Long](m - n + 1)
    var w = 0
    while (w <= m - n) {
      var c = 0xCBF29CE484222325L
      var j = 0
      while (j < n) {
        c = (c ^ tokenHashes.get(w + j).longValue()) * 0x100000001B3L
        j += 1
      }
      out(w) = c
      w += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedupe of the sorted array
    var len = 0
    var r = 0
    while (r < out.length) {
      if (len == 0 || out(r) != out(len - 1)) { out(len) = out(r); len += 1 }
      r += 1
    }
    if (len == out.length) out else java.util.Arrays.copyOf(out, len)
  }

  /** Exact Jaccard of two SORTED distinct long arrays (two-pointer
    * intersection, O(m+n), no hashing). */
  case class SortedJaccard(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "sorted_jaccard"

    protected override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Double.valueOf(sortedJaccardEval(
        l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.HashExprs.sortedJaccardEval($a, $b)")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedJaccard =
      copy(left = l, right = r)
  }

  /** Codegen entry point for [[SortedJaccard]]. */
  def sortedJaccardEval(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  /** Asymmetric set containment |A∩B| / |A| over two SORTED distinct
    * hash arrays — same merge loop as [[SortedJaccard]], normalized by
    * the LEFT set only. Catches subset duplication (a short doc quoted
    * whole inside a long one) that symmetric Jaccard dilutes: A⊂B gives
    * containment(A,B)=1 while jaccard = |A|/|B| can be arbitrarily small.
    */
  case class SortedContainment(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "sorted_containment"

    protected override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Double.valueOf(sortedContainmentEval(
        l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.HashExprs.sortedContainmentEval($a, $b)")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedContainment =
      copy(left = l, right = r)
  }

  /** Codegen entry point for [[SortedContainment]]. */
  def sortedContainmentEval(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / na
  }

  /** Group-level MinHash sketch as a `TypedImperativeAggregate` (SURVEY
    * §7.3 stretch item): aggregates any column into a k-entry signature of
    * the group's value SET; the fraction of equal signature entries
    * between two groups estimates their set Jaccard with standard error
    * ~sqrt(j(1-j)/k). Mergeable (elementwise min) ⇒ map-side partials
    * combine like any native aggregate, so group sketches over 100 TB cost
    * one shuffle of k longs per group.
    */
  case class MinHashSetAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]] {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_set_agg"

    override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(v, child.dataType, 42L)
        MinHashSig.updateMins(buf, h, k)
      }
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var j = 0
      while (j < k) { if (b2(j) < b1(j)) b1(j) = b2(j); j += 1 }
      b1
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 * k)
      buf.foreach(bb.putLong)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      Array.fill(k)(bb.getLong)
    }

    override def withNewMutableAggBufferOffset(o: Int): MinHashSetAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MinHashSetAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MinHashSetAgg =
      copy(child = cs.head)
  }

  /** Estimated Jaccard between two [[MinHashSetAgg]] signatures: fraction
    * of equal entries — the agreement count through the codegen'd
    * [[EqCountLL]] kernel (round-18 sweep; the HOF fold it replaces is
    * interpreted and this was the last one). */
  def minhash_est_jaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    Bridge.column(EqCountLL(Bridge.expression(a), Bridge.expression(b)))
      .cast("double") / size(a)
  }

  // ------------------------------------------------------- Column surface

  def simhash64(hashes: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(hashes)))

  def shingle_hashes(text: Column, n: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(text), n))

  def sorted_jaccard(a: Column, b: Column): Column =
    Bridge.column(SortedJaccard(Bridge.expression(a), Bridge.expression(b)))

  def sorted_containment(a: Column, b: Column): Column =
    Bridge.column(SortedContainment(Bridge.expression(a), Bridge.expression(b)))

  def minhash_sig(hashes: Column, k: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(hashes), k))

  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))

  def sq_dist_ll(a: Column, b: Column): Column =
    Bridge.column(SqDistLL(Bridge.expression(a), Bridge.expression(b)))

  def dot_ll(a: Column, b: Column): Column =
    Bridge.column(DotLL(Bridge.expression(a), Bridge.expression(b)))

  def dot_num(a: Column, b: Column): Column =
    Bridge.column(DotNum(Bridge.expression(a), Bridge.expression(b)))

  def eq_count_ll(a: Column, b: Column): Column =
    Bridge.column(EqCountLL(Bridge.expression(a), Bridge.expression(b)))

  def center_scale(vq: Column, mu: Column, sd: Column): Column =
    Bridge.column(CenterScale(Bridge.expression(vq), Bridge.expression(mu),
      Bridge.expression(sd)))

  def minhash_set_agg(c: Column, k: Int): Column =
    Bridge.column(MinHashSetAgg(Bridge.expression(c), k).toAggregateExpression())
}
