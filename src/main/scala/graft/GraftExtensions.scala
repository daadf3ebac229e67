package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions entry point: makes graft's native functions
  * injectable via configuration —
  * `--conf spark.sql.extensions=graft.GraftExtensions` — so any
  * spark-submit job (not just GraftSession-built ones) gets them.
  * GraftSession wires this class in by default.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[functions.DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        functions.DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[functions.MinHashAgg].getName, "graft_minhash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        functions.MinHashAgg(exprs(0), exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => sys.error(s"graft_minhash k must be an int literal, got $other")
        }).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("graft_translit"),
      new ExpressionInfo(classOf[functions.Transliterate].getName,
        "graft_translit"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        functions.Transliterate(exprs(0))))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[functions.WordShingles].getName,
        "graft_shingles"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        functions.WordShingles(exprs(0), exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => sys.error(s"graft_shingles n must be an int literal, got $other")
        })))
    ext.injectFunction((
      new FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[functions.TopKAgg].getName, "graft_topk"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        functions.TopKAgg(exprs(0), exprs(1), exprs(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => sys.error(s"graft_topk k must be an int literal, got $other")
        }).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("graft_heavyhitters"),
      new ExpressionInfo(classOf[functions.HeavyHittersAgg].getName,
        "graft_heavyhitters"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        functions.HeavyHittersAgg(exprs(0), exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other =>
            sys.error(s"graft_heavyhitters cap must be an int literal, got $other")
        }).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[functions.SimHash64].getName,
        "graft_simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        functions.SimHash64(exprs(0))))
    // opt-in bucketed rewrite of point-in-interval theta-joins
    // (spark.graft.rangeJoin.bucketSeconds > 0 enables it)
    ext.injectOptimizerRule(session => plans.RangeJoinRule(session))
  }
}
