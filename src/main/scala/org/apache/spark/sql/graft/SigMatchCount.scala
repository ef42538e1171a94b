package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native Catalyst expression: number of positions at which two bigint
  * arrays agree — the MinHash signature-match count driving
  * `q_dedup_minhash_verify`'s Jaccard estimate.
  *
  * Why native: the estimate runs once per LSH candidate pair (millions
  * of rows at sf0.1, billions at corpus scale), and the higher-order
  * equivalent `aggregate(zip_with(a, b, (x, y) -> IF(x = y, 1, 0)), 0L, +)`
  * pays per-element lambda dispatch outside whole-stage codegen —
  * measured 37 s vs ~3 s for the suite-integrated native form at sf0.1.
  * This is one fused while-loop over two primitive long arrays inside
  * codegen, the same packaging as [[DotProduct]].
  *
  * Semantics: unequal lengths → NULL (a signature-width mismatch is a
  * caller bug, poisoned not silently zero-padded); NULL elements never
  * match (min-hash signatures are never NULL; totality is cheap).
  */
case class SigMatchCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sig_match_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var c = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) {
        c += 1L
      }
      i += 1
    }
    java.lang.Long.valueOf(c)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $c = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$x.isNullAt($i) && !$y.isNullAt($i) &&
         |        $x.getLong($i) == $y.getLong($i)) {
         |      $c += 1L;
         |    }
         |  }
         |  ${ev.value} = $c;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SigMatchCount {
  /** Register `sig_match_count(a, b)` for SQL-text use. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sig_match_count", exprs => SigMatchCount(exprs(0), exprs(1)), "scala_udf")

  /** Column-API form — wraps the expression via the ColumnNode bridge. */
  def sigMatchCount(a: Column, b: Column): Column =
    ExpressionUtils.column(SigMatchCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
