package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonicalization as a native Catalyst expression with
  * whole-stage codegen — the text-canonicalization step every dedup /
  * fingerprint pipeline must run FIRST: the same visible string arrives
  * from different crawls as composed (é = U+00E9) or decomposed
  * (e + U+0301) codepoints, and every digest-based operator downstream
  * (exact dedup, minhash, URL canonicalization) treats them as
  * different bytes unless normalization collapses them.
  *
  * Spark ships no normalization builtin, so this is the (b)-tier
  * extension path: a scalar `UnaryExpression` with `doGenCode` — the
  * generated code stays inside the WholeStageCodegen span (one static
  * call per row, no UDF wrapping, no serialization wall). NFC is
  * chosen over NFKC deliberately: canonical equivalence only — it
  * never conflates compatibility forms (① vs 1) that may be
  * training-relevant content differences.
  *
  * Cross-engine: java.text.Normalizer and DuckDB's `nfc_normalize`
  * both implement Unicode canonical composition, so NFC output is
  * byte-identical and md5-oracle-safe on both engines (NormalizeSpec
  * pins composed ≡ decomposed on non-ASCII fixtures; the gate key
  * injects decomposed sequences into the ASCII corpus).
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object Normalize {
  /** Column API for [[NfcNormalize]]. */
  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
