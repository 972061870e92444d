package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical-composition pass every
  * text-corpus pipeline runs before hashing/dedup (a decomposed
  * `e + U+0301` and a precomposed `é` must fingerprint identically, or
  * the same sentence dedups differently depending on which editor
  * produced it). Spark has no built-in for this; the JDK does
  * (`java.text.Normalizer`), and DuckDB's `nfc_normalize` implements
  * the same Unicode 15 canonical composition — so the result crosses
  * the oracle boundary bit-for-bit.
  *
  * The `isNormalized` fast path matters at scale: real corpora are
  * overwhelmingly already-NFC, and the check is a single forward scan
  * with no allocation (quick-check property), so the common row costs
  * one pass and zero copies — only actually-decomposed rows pay for
  * normalize's buffer. Codegen'd via static JDK calls; stays inside
  * whole-stage codegen like the other custom scalar expressions.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(s: Any): Any = {
    val u = s.asInstanceOf[UTF8String]
    val str = u.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      s"""
         |java.lang.String $str = $c.toString();
         |${ev.value} = java.text.Normalizer.isNormalized($str, java.text.Normalizer.Form.NFC)
         |  ? $c
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($str, java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
