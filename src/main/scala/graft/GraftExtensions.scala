package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{FloatVecDot, SortedLongIntersect}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions as SQL functions at session build time, so
  * pure-SQL users (spark-sql, Thrift server, notebooks) get them
  * without touching the Scala API:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   SELECT vec_dot(a.embedding, b.embedding) FROM ...
  *   SELECT sorted_intersect(a.shingles, b.shingles) FROM ...
  * }}}
  *
  * The Scala API path (`VecExpressions.ensureRegistered`) registers
  * the same builders lazily per session; this class is the
  * config-driven front door a cluster deployment wires once.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FloatVecDot(exprs(0), exprs(1))))
    extensions.injectFunction((
      FunctionIdentifier("sorted_intersect"),
      new ExpressionInfo(classOf[SortedLongIntersect].getName, "sorted_intersect"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedLongIntersect(exprs(0), exprs(1))))
  }
}
