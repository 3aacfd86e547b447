package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization kernel shared by interpreted eval
  * and generated code: NFC composition → lowercase (root locale) →
  * collapse runs of ASCII whitespace (space/\t/\n/\r/\f — the RE2
  * `\s` class, so the DuckDB oracle's `regexp_replace('\s+')` is the
  * same transform) to a single space, trimming the ends.
  *
  * One pass of `java.text.Normalizer` (the public-JDK ICU subset)
  * plus a single StringBuilder sweep; no regex at runtime.
  */
object TextNormKernel {
  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' || cp == '\f'

  def normalize(s: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(nfc.length)
    var pendingSpace = false
    var i = 0
    while (i < nfc.length) {
      val cp = nfc.codePointAt(i)
      if (isWs(cp)) pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.appendCodePoint(cp)
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `graft_normalize_text(str)` — canonical text form for exact-dedup
  * keys and downstream tokenization: NFC + casefold + whitespace
  * collapse ([[TextNormKernel]]). A native Catalyst expression with
  * `doGenCode` so it stays inside whole-stage codegen (a Scala UDF
  * here would break the codegen span around every scan it guards),
  * and idempotent (normalize ∘ normalize = normalize), so re-running
  * an ingest stage over already-clean text is a no-op.
  */
case class NormalizeText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize_text"

  override def nullSafeEval(input: Any): Any =
    TextNormKernel.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextNormKernel.normalize($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
