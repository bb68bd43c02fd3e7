package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd rolling polynomial fingerprint over a string's bytes:
  * acc = (acc*31 + byte) mod 1e9+7.
  *
  * The HOF formulation (transform over sequence + substr + ascii per char)
  * evaluates ~3 interpreted lambdas per character; this is a tight loop
  * over the UTF8String's bytes inside whole-stage codegen. Byte-wise ==
  * the char-wise definition for ASCII text (the oracle's `ascii(text[i])`
  * equals the byte for ASCII); differential-spec'd against the HOF. */
case class PolynomialFingerprint(child: Expression, init: Long = 0L)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var acc = init // fp(prefix || text) = fold over text seeded with fp(prefix)
    var i = 0
    while (i < n) { acc = (acc * 31L + (s.getByte(i) & 0xFF)) % 1000000007L; i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $s.numBytes();
         |long $acc = ${init}L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc = ($acc * 31L + ($s.getByte($i) & 0xFF)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolynomialFingerprint =
    copy(child = newChild)
}

object TextExpressions {
  def fingerprint(c: Column): Column =
    Bridge.column(PolynomialFingerprint(Bridge.expression(c)))

  /** fp(prefix || text) in ONE loop over text: the fold's accumulator
    * starts at fp(prefix) (polynomial prefix identity). The cheap form of
    * a seeded hash family — no concat, no branches, codegen stays small
    * when several seeds appear in one projection. */
  def seededFingerprint(c: Column, init: Long): Column =
    Bridge.column(PolynomialFingerprint(Bridge.expression(c), init))
}
