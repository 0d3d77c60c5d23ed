package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd MinHash signature agreement: the number of positions where two
  * long-array signatures hold the same value — the estimator kernel of
  * [[graft.ext.Dedup.estimatedJaccardPairs]] (agreement/numHashes is the
  * unbiased Jaccard estimate).
  *
  * Replaces the interpreted `aggregate(zip_with(sa, sb, ...))` HOF pair
  * (DEVNOTES rule 10: HOF lambdas run interpreted, per element, per pair —
  * on the candidate-pair scan that was 64 boxed lambda invocations per
  * pair, ~2 per signature position) with one primitive loop inside
  * WholeStageCodegen. Cross-checked element-for-element against the HOF
  * formulation in `SigAgreeSpec`.
  *
  * Positions beyond the shorter signature never agree (signatures compared
  * in production always share numHashes, so this is a non-surprise
  * degenerate-input rule, matching the zip_with null != anything behavior).
  */
case class SigAgree(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sig_agree expects two array<bigint>, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    val n = math.min(la.numElements(), ra.numElements())
    var agree = 0L
    var i = 0
    while (i < n) {
      if (la.getLong(i) == ra.getLong(i)) agree += 1L
      i += 1
    }
    agree
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("agree")
      s"""
         |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($l.getLong($i) == $r.getLong($i)) $acc++;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgree =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sig_agree"
}
