package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization for corpus pipelines: Unicode NFC →
  * lowercase → collapse whitespace runs to one space → trim. The first
  * pass every dedup/fingerprint/tokenize stage wants, fused into ONE
  * native expression so a 100 TB cleaning pass stays inside whole-stage
  * codegen instead of stacking four string built-ins (each of which
  * materializes an intermediate copy of every document per row).
  *
  * NFC first, then case: composing "e"+U+0301 before lowercasing matches
  * the oracle engine's `lower(nfc_normalize(x))` exactly. Lowercasing is
  * `Locale.ROOT` (locale-independent — a Turkish default locale must not
  * change dedup keys between clusters). The whitespace class is the
  * explicit ASCII set [ \t\n\r\f\x0B]: both JVM regex `\s` and RE2 `\s`
  * have engine-specific edge members, so the set is spelled out and
  * mirrored literally in oracle SQL.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "norm_text"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"norm_text requires a STRING argument, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  // one static helper call — the expression itself stays codegen'd (no
  // interpreted fallback), the JVM inlines the hot loop
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {

  private def isWs(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r' || ch == '\f' || ch == '\u000B'

  /** NFC → lowercase(ROOT) → collapse [ \t\n\r\f\x0B]+ to ' ' → trim. */
  def normalize(s: UTF8String): UTF8String = {
    val str = java.text.Normalizer
      .normalize(s.toString, java.text.Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    var pendingSpace = false
    while (i < str.length) {
      val ch = str.charAt(i)
      if (isWs(ch)) pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        sb.append(ch)
        pendingSpace = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Column API. */
  def normText(c: Column): Column =
    Bridge.column(NormalizeText(Bridge.expression(c)))
}
