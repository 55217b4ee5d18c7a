package graft

import graft.functions.{ArgMinBy, MinHashSig, MinHashSigP61, SimHash64, SimHash64Md5, TitleCase}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions, so
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions`) exposes them to pure-SQL
  * users:
  *
  *   title_case(s)             — str_to_title-compatible casing
  *   simhash64(tokens)         — 64-bit SimHash of array<string>
  *   minhash_sig(tokens, k, n) — MinHash signature array<long>
  *   simhash64_md5(tokens)         — oracle-replayable md5 SimHash
  *   minhash_sig_p61(tokens, k, n) — oracle-replayable md5/mod-p MinHash
  *   arg_min_by(p, d, t)       — hash-aggregable argmin aggregate
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // Optimizer rule: rescue min_by-over-struct from SortAggregate (see
    // graft.rules.RewriteMinByStruct scaladoc).
    e.injectOptimizerRule(_ => graft.rules.RewriteMinByStruct)
    e.injectFunction((
      new FunctionIdentifier("title_case"),
      new ExpressionInfo(classOf[TitleCase].getName, "title_case"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TitleCase(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        def intArg(i: Int) = exprs(i) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig argument ${i + 1} must be an integer literal, got $other")
        }
        MinHashSig(exprs.head, intArg(1), intArg(2))
      }))
    e.injectFunction((
      new FunctionIdentifier("simhash64_md5"),
      new ExpressionInfo(classOf[SimHash64Md5].getName, "simhash64_md5"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64Md5(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("minhash_sig_p61"),
      new ExpressionInfo(classOf[MinHashSigP61].getName, "minhash_sig_p61"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        def intArg(i: Int) = exprs(i) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig_p61 argument ${i + 1} must be an integer literal, got $other")
        }
        MinHashSigP61(exprs.head, intArg(1), intArg(2))
      }))
    e.injectFunction((
      new FunctionIdentifier("arg_min_by"),
      new ExpressionInfo(classOf[ArgMinBy].getName, "arg_min_by"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArgMinBy.coerced(exprs(0), exprs(1), exprs(2)).toAggregateExpression()))
  }
}
