package graft.expr

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native dot product over two float/double array columns → double.
  *
  * Replaces `aggregate(zip_with(a, b, _*_), 0.0, _+_)`, which Spark
  * evaluates interpreted with per-element lambda dispatch and two
  * intermediate arrays — this is a single primitive loop, the inner kernel
  * of every similarity-search operator (12.5M pairs × 64 dims at sf0.1
  * went from 34 s to ~2 s). Fold order is sequential (index order), so
  * results are bit-identical to the lambda formulation.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "vec_dot expects two ARRAY<FLOAT|DOUBLE> args")

  private val leftIsFloat = left.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }
  private val rightIsFloat = right.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    // dimension mismatch OR any null element → null, matching the
    // zip_with/aggregate lambda semantics (zip_with pads with null and a
    // null element's product is null; null propagates through the fold) —
    // reading a null slot as 0 would let wrong cosines into top-k results
    if (aa.numElements() != bb.numElements()) return null
    val n = aa.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      val x = if (leftIsFloat) aa.getFloat(i).toDouble else aa.getDouble(i)
      val y = if (rightIsFloat) bb.getFloat(i).toDouble else bb.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** Whole-stage codegen: the same primitive loop inlined into the stage
    * (identical order of operations → bit-identical to nullSafeEval).
    * A result can be null even for non-null inputs (length mismatch, null
    * element), so this manages its own null flag instead of
    * nullSafeCodeGen. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val a = ctx.freshName("a"); val b = ctx.freshName("b")
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val getA = if (leftIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
    val getB = if (rightIsFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
    ev.copy(code = code"""
      ${leftGen.code}
      ${rightGen.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!(${leftGen.isNull}) && !(${rightGen.isNull})) {
        org.apache.spark.sql.catalyst.util.ArrayData $a = ${leftGen.value};
        org.apache.spark.sql.catalyst.util.ArrayData $b = ${rightGen.value};
        int $n = $a.numElements();
        if ($n == $b.numElements()) {
          ${ev.isNull} = false;
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            $acc += $getA * $getB;
          }
          if (!${ev.isNull}) ${ev.value} = $acc;
        }
      }""")
  }

  override def nullable: Boolean = true
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** Number of positions where two ARRAY<BIGINT> columns agree — the MinHash
  * signature-agreement kernel (estimated Jaccard = vec_eq_count / k). A
  * primitive loop instead of `size(filter(zip_with(...)))`, which Spark
  * evaluates interpreted per pair. Null on length mismatch. */
case class VecEqCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "vec_eq_count expects two ARRAY<BIGINT> args")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    if (aa.numElements() != bb.numElements()) return null
    var c = 0
    var i = 0
    val n = aa.numElements()
    while (i < n) {
      // null positions never count as agreement — `when(x === y, 1)` is
      // null for a null operand and the filter drops it
      if (!aa.isNullAt(i) && !bb.isNullAt(i) && aa.getLong(i) == bb.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** Whole-stage codegen: same loop as nullSafeEval; manages its own null
    * flag (null on length mismatch even for non-null inputs). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val a = ctx.freshName("a"); val b = ctx.freshName("b")
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val c = ctx.freshName("c")
    ev.copy(code = code"""
      ${leftGen.code}
      ${rightGen.code}
      boolean ${ev.isNull} = true;
      int ${ev.value} = 0;
      if (!(${leftGen.isNull}) && !(${rightGen.isNull})) {
        org.apache.spark.sql.catalyst.util.ArrayData $a = ${leftGen.value};
        org.apache.spark.sql.catalyst.util.ArrayData $b = ${rightGen.value};
        int $n = $a.numElements();
        if ($n == $b.numElements()) {
          ${ev.isNull} = false;
          int $c = 0;
          for (int $i = 0; $i < $n; $i++) {
            if (!$a.isNullAt($i) && !$b.isNullAt($i)
                && $a.getLong($i) == $b.getLong($i)) $c++;
          }
          ${ev.value} = $c;
        }
      }""")
  }

  override def nullable: Boolean = true
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecEqCount =
    copy(left = l, right = r)
  override def prettyName: String = "vec_eq_count"
}

/** Shared 60-bit md5-derived hash: the first 15 hex chars of md5(utf8)
  * parsed as a long — i.e. the top 60 bits of the digest. Chosen because
  * every SQL engine has md5, so hash-dependent operators (MinHash, SimHash,
  * rolling hashes, SRP buckets) are verifiable bit-for-bit against an
  * independent engine: `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)` in
  * DuckDB ≡ `conv(substring(md5(s), 1, 15), 16, 10)` in Spark ≡ this. */
object Hash60 {
  val Bits = 60
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def hash(utf8: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val b = d.digest(utf8)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    (v << 4) | ((b(7) & 0xffL) >>> 4)
  }
  def hash(s: String): Long = hash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}

/** Native 60-bit SimHash over whitespace tokens of a lowercased string:
  * per-bit majority vote of [[Hash60]](token). One pass, no intermediate
  * arrays — replaces a doubly-nested higher-order aggregate that evaluated
  * interpreted. md5-derived hashing keeps signatures verifiable in any
  * engine with md5 (see the q22/q29 DuckDB oracles), unlike xxhash64.
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "simhash64 expects a STRING arg")

  override protected def nullSafeEval(text: Any): Any = {
    // Spark-lower() semantics + the regex-`\s` whitespace class — must
    // tokenize exactly like the lower()/tokens() column formulation (see
    // WordShingles for the rationale)
    val s = WordShingles.lowerLikeSpark(text.asInstanceOf[UTF8String].toString)
    val votes = new Array[Int](Hash60.Bits)
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && WordShingles.isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !WordShingles.isWs(s.charAt(i))) i += 1
      if (i > start) {
        val h = Hash60.hash(s.substring(start, i))
        var b = 0
        while (b < Hash60.Bits) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < Hash60.Bits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** Native quantized sign-random-projection bucket: `nBits` hyperplanes of
  * md5-derived integer weights (`Hash60("plane,dim") mod 2001 - 1000`)
  * against the vector quantized to `round(v·1000)` — exact integer
  * arithmetic, so bucket assignments are bit-deterministic on every engine
  * (see the q24 DuckDB oracle). The weight table depends only on
  * (plane, dim), so it's computed once per executor and the per-row work
  * is a primitive multiply-add loop — the lambda formulation re-derived
  * every weight per row through interpreted md5 calls (~30× slower).
  */
case class SrpBucket(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), IntegerType) if right.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "srp_bucket expects (ARRAY<FLOAT|DOUBLE>, literal INT nBits)")
    }

  private val isFloat = left.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  // weight rows grow on demand (dim count comes from the data); plane rows
  // are immutable once built so benign races just recompute identical rows
  @transient private lazy val weights =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()
  private def weightRow(plane: Int, dims: Int): Array[Long] = {
    val cached = weights.get(plane)
    if (cached != null && cached.length >= dims) cached
    else {
      val w = new Array[Long](dims)
      var d = 0
      while (d < dims) {
        w(d) = java.lang.Long.remainderUnsigned(Hash60.hash(s"$plane,$d"), 2001L) - 1000L
        d += 1
      }
      weights.put(plane, w)
      w
    }
  }

  override protected def nullSafeEval(vec: Any, nAny: Any): Any = {
    val v = vec.asInstanceOf[ArrayData]
    val nBits = nAny.asInstanceOf[Int]
    val dims = v.numElements()
    // quantize once per row (round half away from zero — matches the
    // round() SQL function in both Spark and DuckDB). A null element makes
    // every projection null, and `when(null >= 0, 1).otherwise(0)` takes
    // the otherwise branch — the lambda formulation yields bucket 0, so
    // mirror that exactly
    var d = 0
    while (d < dims) {
      if (v.isNullAt(d)) return 0L
      d += 1
    }
    val q = new Array[Long](dims)
    d = 0
    while (d < dims) {
      val x = (if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)) * 1000.0
      q(d) = (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong
      d += 1
    }
    var bucket = 0L
    var p = 0
    while (p < nBits) {
      val w = weightRow(p, dims)
      var proj = 0L
      d = 0
      while (d < dims) { proj += q(d) * w(d); d += 1 }
      bucket = bucket * 2 + (if (proj >= 0) 1L else 0L)
      p += 1
    }
    bucket
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SrpBucket =
    copy(left = l, right = r)
  override def prettyName: String = "srp_bucket"
}

/** Exact integer power for the reference's `^` operator: `x.pow(abs(y))`
  * on the JVM's wrapping Long arithmetic (reference: config/types.rs:78,85
  * — Rust release-mode isize semantics). A double-based `pow` silently
  * rounds any result above 2^53; this stays exact for every result that
  * fits in a Long (overflow wraps, as the reference's release build does).
  */
case class IntPow(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "int_pow expects two BIGINT args")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    var base = a.asInstanceOf[Long]
    var exp = math.abs(b.asInstanceOf[Long])
    var acc = 1L
    while (exp > 0) {
      if ((exp & 1L) == 1L) acc *= base
      base *= base
      exp >>= 1
    }
    acc
  }

  /** Whole-stage codegen: square-and-multiply inlined (wrapping Java long
    * arithmetic — identical to nullSafeEval; result is never null for
    * non-null inputs, so nullSafeCodeGen applies). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (aVal, bVal) => {
      val base = ctx.freshName("base"); val exp = ctx.freshName("exp")
      val acc = ctx.freshName("acc")
      s"""
        long $base = $aVal;
        long $exp = $bVal < 0L ? -$bVal : $bVal;
        long $acc = 1L;
        while ($exp > 0L) {
          if (($exp & 1L) == 1L) $acc *= $base;
          $base *= $base;
          $exp >>= 1;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntPow =
    copy(left = l, right = r)
  override def prettyName: String = "int_pow"
}

/** Native Morton z-value: interleave the low `bits` bits of x (odd
  * positions) and y (even) — the [[graft.operators.ZOrder]] layout key.
  * Replaces the 16-iteration interpreted `aggregate(sequence(...))` fold
  * (per-row lambda dispatch + an intermediate sequence array) with one
  * primitive loop; identical math — disjoint bit terms summed in index
  * order — so results are bit-identical to the lambda formulation (and
  * to the SQL-comprehension oracle mirror). */
case class ZValue(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (first.dataType == LongType && second.dataType == LongType &&
        third.dataType == IntegerType && third.foldable) {
      // match ZOrder.zValue's require: bits > 31 makes the generated
      // shifts wrap mod 64 (garbage z-values) and bits <= 0 silently
      // returns 0 — direct call_function users must get an analysis
      // error, not wrong results
      val bits = third.eval(null)
      if (bits != null && (bits.asInstanceOf[Int] < 1 || bits.asInstanceOf[Int] > 31))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"z_value bits must be in [1,31], got $bits")
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "z_value expects (BIGINT x, BIGINT y, INT literal bits)")

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val x = a.asInstanceOf[Long]; val y = b.asInstanceOf[Long]
    val bits = c.asInstanceOf[Int]
    var z = 0L
    var i = 0
    while (i < bits) {
      z += (((x >> i) & 1L) << (2 * i + 1)) + (((y >> i) & 1L) << (2 * i))
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv, bv) => {
      val z = ctx.freshName("z"); val i = ctx.freshName("i")
      s"""
        long $z = 0L;
        for (int $i = 0; $i < $bv; $i++) {
          $z += ((($xv >> $i) & 1L) << (2 * $i + 1)) + ((($yv >> $i) & 1L) << (2 * $i));
        }
        ${ev.value} = $z;
      """
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): ZValue =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "z_value"
}

object VectorFunctions {
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args(0))),
    (FunctionIdentifier("vec_eq_count"),
      new ExpressionInfo(classOf[VecEqCount].getName, "vec_eq_count"),
      (args: Seq[Expression]) => VecEqCount(args(0), args(1))),
    (FunctionIdentifier("srp_bucket"),
      new ExpressionInfo(classOf[SrpBucket].getName, "srp_bucket"),
      (args: Seq[Expression]) => SrpBucket(args(0), args(1))),
    (FunctionIdentifier("int_pow"),
      new ExpressionInfo(classOf[IntPow].getName, "int_pow"),
      (args: Seq[Expression]) => IntPow(args(0), args(1))),
    (FunctionIdentifier("z_value"),
      new ExpressionInfo(classOf[ZValue].getName, "z_value"),
      (args: Seq[Expression]) => ZValue(args(0), args(1), args(2))))
}
