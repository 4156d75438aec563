package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static normalization kernels shared by interpreted eval and codegen
  * (same shape as [[CityHash]]'s statics). All-ASCII inputs short-
  * circuit without decoding: every Unicode normal form is the identity
  * on ASCII, and `numBytes == numChars` iff the string is all-ASCII —
  * on a mostly-ASCII 100 TB corpus the hot path allocates nothing. */
object UnicodeNorm {
  private def norm(s: UTF8String, f: Normalizer.Form): UTF8String = {
    if (s.numBytes == s.numChars) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }
  def nfc(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFC)
  def nfd(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFD)
  def nfkc(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFKC)
  def nfkd(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFKD)
}

/** CH `normalizeUTF8NFC/NFD/NFKC/NFKD(s)` as one native codegen'd
  * expression — the normalization step a dedup pipeline runs before
  * hashing keys (composed vs decomposed accents must collide).
  * `form` ∈ {"nfc","nfd","nfkc","nfkd"} selects the static kernel. */
case class NormalizeUTF8(child: Expression, form: String)
    extends UnaryExpression {

  require(Set("nfc", "nfd", "nfkc", "nfkd")(form), s"unknown form: $form")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = s"normalizeUTF8${form.toUpperCase}"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    form match {
      case "nfc" => UnicodeNorm.nfc(s)
      case "nfd" => UnicodeNorm.nfd(s)
      case "nfkc" => UnicodeNorm.nfkc(s)
      case "nfkd" => UnicodeNorm.nfkd(s)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = UnicodeNorm.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$kernel.$form($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeUTF8 =
    copy(child = newChild)
}
