package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (UAX #15) of a string column — the text
  * canonicalization pass an LLM-data pipeline runs BEFORE any hashing or
  * dedup: visually-identical strings with different codepoint sequences
  * ("é" composed vs "e"+combining-acute, the Å angstrom-sign singleton,
  * NFKC's compatibility folds like the "ﬁ" ligature) otherwise hash to
  * different fingerprints and defeat every exact/MinHash/SimHash dedup
  * downstream.
  *
  * Spark has no built-in for this; implemented as a native codegen'd
  * expression over `java.text.Normalizer` (ICU-equivalent tables, same
  * UAX #15 result as DuckDB's utf8proc-backed `nfc_normalize`, which
  * oracles the NFC form). Form is a plan-time constant: NFC | NFD |
  * NFKC | NFKD. Per-row cost is linear in string length with the
  * quick-check fast path for already-normalized text (the common case —
  * Normalizer short-circuits on isNormalized-style scans internally).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize requires string input, got ${child.dataType.catalogString}")
    else if (!UnicodeNormalize.Forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize form must be one of ${UnicodeNormalize.Forms.keys.mkString("/")}, got $form")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, UnicodeNormalize.Forms(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        s"java.text.Normalizer.Form.$form))")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)

  override def prettyName: String = "unicode_normalize"
}

object UnicodeNormalize {
  val Forms: Map[String, Normalizer.Form] = Map(
    "NFC" -> Normalizer.Form.NFC, "NFD" -> Normalizer.Form.NFD,
    "NFKC" -> Normalizer.Form.NFKC, "NFKD" -> Normalizer.Form.NFKD)
}
