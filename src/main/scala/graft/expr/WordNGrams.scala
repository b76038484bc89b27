package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The one tokenize→shingle→distinct implementation shared by every
  * native shingle kernel, kept bit-identical BY CONSTRUCTION to the
  * column formulation `word_ngrams ≡ distinct n-grams of
  * split(trim(regexp_replace(lower(text), "\s+", " ")), " ")`:
  *   - lowercasing replicates Spark's `lower()` exactly: the all-ASCII
  *     fast path is locale-independent, and the non-ASCII slow path is
  *     default-locale `String.toLowerCase()` (UTF8String.toLowerCaseSlow)
  *     — hard-coding Locale.ROOT would diverge from the column path on
  *     e.g. Turkish-locale JVMs with non-ASCII text
  *   - the whitespace class is EXACTLY Java regex `\s` = [ \t\n\x0B\f\r]
  *     (Character.isWhitespace accepts more, e.g. U+001C-1F, and would
  *     tokenize differently than the regex-based column path)
  */
private[expr] object WordShingles {
  @inline def isWs(c: Char): Boolean = c == ' ' || (c >= '\t' && c <= '\r')

  /** Lowercase with Spark `lower()` semantics (see class doc). */
  def lowerLikeSpark(text: String): String = {
    var ascii = true
    var i = 0
    while (ascii && i < text.length) {
      if (text.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    // for pure ASCII, Locale.ROOT toLowerCase IS the ASCII mapping
    if (ascii) text.toLowerCase(java.util.Locale.ROOT) else text.toLowerCase()
  }

  /** Distinct shingles in first-occurrence order (order is irrelevant
    * downstream — SSJoin and MinHash treat the result as a set). */
  def shingleSet(text: String, n: Int): java.util.LinkedHashSet[String] = {
    val s = lowerLikeSpark(text)
    val toks = new scala.collection.mutable.ArrayBuffer[String](64)
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) toks += s.substring(start, i)
    }
    val seen = new java.util.LinkedHashSet[String](
      math.max((toks.length - n + 1) * 2, 4))
    if (toks.length < n) return seen
    var j = 0
    val sb = new java.lang.StringBuilder(64)
    while (j <= toks.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(j + k))
        k += 1
      }
      seen.add(sb.toString)
      j += 1
    }
    seen
  }
}

/** Native word n-gram shingle expression: lowercase → whitespace-tokenize →
  * n-gram → distinct, in ONE pass with no intermediate arrays.
  *
  * Replaces a `transform(sequence(...), i -> concat_ws(" ", slice(...)))`
  * higher-order-function tree, which Spark evaluates interpreted
  * (CodegenFallback) with per-element lambda dispatch — this expression is
  * ~10× faster on the same corpus and is the hot inner loop of every
  * shingle-based dedup operator at 100 TB.
  */
case class WordNGrams(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure("text must be STRING")
    else if (!right.foldable || right.dataType != IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure("n must be a literal INT")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override protected def nullSafeEval(text: Any, nAny: Any): Any = {
    val seen = WordShingles.shingleSet(
      text.asInstanceOf[UTF8String].toString, nAny.asInstanceOf[Int])
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): WordNGrams =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "word_ngrams"
}

/** Like [[WordNGrams]] but emits each distinct shingle's 60-bit
  * [[Hash60]] directly — one pass from text to join-ready hash keys, no
  * intermediate string array crossing the row boundary and no per-row
  * md5 column evaluation downstream. Distinctness is by shingle STRING
  * (before hashing), so a hash collision yields duplicate hash entries
  * exactly like hashing the distinct string set would — bit-compatible
  * with `transform(word_ngrams(t, n), s -> hash60(s))` and with the
  * DuckDB oracle formulation. */
case class WordNGramHashes(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure("text must be STRING")
    else if (!right.foldable || right.dataType != IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure("n must be a literal INT")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override protected def nullSafeEval(text: Any, nAny: Any): Any = {
    val seen = WordShingles.shingleSet(
      text.asInstanceOf[UTF8String].toString, nAny.asInstanceOf[Int])
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = Hash60.hash(it.next()); p += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): WordNGramHashes =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "word_ngram_hashes"
}

/** Registration for graft's native expressions: either through
  * `spark.sql.extensions=graft.expr.GraftExtensions` or programmatically
  * via [[GraftFunctions.register]]. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(e.injectFunction)
}

object GraftFunctions {
  val wordNGramsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_ngrams"),
    new ExpressionInfo(classOf[WordNGrams].getName, "word_ngrams"),
    (args: Seq[Expression]) => WordNGrams(args(0), args(1)))

  val wordNGramHashesDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_ngram_hashes"),
    new ExpressionInfo(classOf[WordNGramHashes].getName, "word_ngram_hashes"),
    (args: Seq[Expression]) => WordNGramHashes(args(0), args(1)))

  val nfcNormalizeDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (args: Seq[Expression]) => NfcNormalize(args.head))

  def all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(wordNGramsDescriptor, wordNGramHashesDescriptor, nfcNormalizeDescriptor) ++
      VectorFunctions.descriptors

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = all.foreach { case (id, info, builder) =>
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
