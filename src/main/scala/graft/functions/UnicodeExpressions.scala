package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization for web text. A crawl mixes composed
  * (`é` U+00E9) and decomposed (`e` + U+0301) forms freely; every
  * byte-equality downstream — fingerprints, exact dedup, uniqueness keys,
  * shingle hashes — silently treats canonically-equivalent strings as
  * different unless the text is normalized first. Run this BEFORE
  * [[graft.text.TextFunctions.fingerprint]] / dedup when the corpus is
  * not known to be ASCII.
  *
  * Wraps `java.text.Normalizer` (JDK NFC) as a null-safe expression with
  * an `isNormalized` fast path, so the dominant already-normalized case
  * costs one scan and zero allocation. The driver oracle re-derives it
  * with DuckDB's OWN independent `nfc_normalize` implementation — the
  * same-answer check spans two unrelated Unicode libraries.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) {
      input.asInstanceOf[UTF8String]
    } else {
      UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

object UnicodeExpressions {
  def nfcNormalize(c: Column): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      NfcNormalize(org.apache.spark.sql.GraftColumnShim.expression(c)))
}
