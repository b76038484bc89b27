package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static NFC kernel the generated code calls — a top-level object gets a
  * static forwarder, so `graft.expr.TextNorm.nfc(...)` is reachable from
  * Janino-compiled code. */
object TextNorm {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // Fast path: NFC is the identity on ASCII (and Normalizer.isNormalized
    // is a cheap scan) — the overwhelmingly common case in a web corpus,
    // so the allocation-heavy normalize() runs only on strings that need it.
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode canonical composition (NFC) as a native, codegen'd expression.
  *
  * Normalization is the FIRST pass of any multilingual corpus pipeline:
  * the same visible text arrives both precomposed (é = U+00E9) and
  * decomposed (e + U+0301) across crawl sources, and every downstream
  * exact-match operator — hash dedup, decontamination probes, vocab
  * counting, fingerprints — silently treats the two encodings as
  * different documents unless the corpus is canonicalized once up front.
  *
  * Spark ships no normalization builtin; the usual escape hatch is a
  * Scala UDF (serialization + interpreted eval in the hot path). This is
  * instead a real `Expression` whose `doGenCode` emits one static call,
  * so it stays inside WholeStageCodegen spans, and the kernel takes the
  * `isNormalized` fast path (no allocation) on already-NFC input —
  * effectively free on ASCII, which dominates web text. Map-only,
  * embarrassingly parallel: the 100 TB cost model is one codegen'd pass
  * over the corpus.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure("text must be STRING")

  override protected def nullSafeEval(input: Any): Any =
    TextNorm.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextNorm.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}
