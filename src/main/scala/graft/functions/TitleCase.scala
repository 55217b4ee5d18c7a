package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Title-casing that matches R `stringr::str_to_title` (ICU word
  * segmentation): a letter is uppercased iff it follows a non-letter, so
  * hyphenated/apostrophized names come out "Saint-Martin", "L'Europe" —
  * unlike Spark's builtin `initcap`, which only breaks on whitespace
  * (SURVEY.md §2.7 F3; ref `R_groupe4.R:178`).
  *
  * Implemented as a custom Catalyst `Expression` with `doGenCode`
  * delegating to a static helper — stays inside whole-stage codegen (no
  * UDF serialization, no codegen fallback), per the custom-function
  * preference order in SURVEY.md §4.
  */
object TitleCaseUtil {
  def titleCase(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var prevLetter = false
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val isLetter = Character.isLetter(cp)
      val out =
        if (isLetter && !prevLetter) Character.toTitleCase(cp)
        else if (isLetter) Character.toLowerCase(cp)
        else cp
      sb.appendCodePoint(out)
      prevLetter = isLetter
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

case class TitleCase(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"title_case requires a string argument, got ${child.dataType}")
  }

  override def nullSafeEval(v: Any): Any =
    TitleCaseUtil.titleCase(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TitleCaseUtil.titleCase($c)")

  override protected def withNewChildInternal(newChild: Expression): TitleCase =
    copy(child = newChild)

  override def prettyName: String = "title_case"
}

object TitleCase {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(c: Column): Column =
    ColumnBridge.column(TitleCase(ColumnBridge.expression(c)))

  /** Register as a SQL function (`SELECT title_case(x)`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "title_case", exprs => TitleCase(exprs.head), "scala_udf")
}
