package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{GraftFunctions, MaxRowByLong}

/**
 * SparkSessionExtensions entry point: lets any consumer enable the engine's
 * native functions in plain SQL without calling Scala registration code —
 *
 *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
 *   spark.sql("SELECT k, max_row_by_long(struct(*), lsn) FROM changes GROUP BY k")
 *
 * Registered:
 *  - max_row_by_long(value, ord): native arg-max TypedImperativeAggregate
 *    (ObjectHashAggregate, map-side partial combine) — the CDC fold without
 *    built-in max_by's SortAggregate fallback.
 *
 * Session-local registration (`GraftFunctions.register`) remains for
 * programmatic use; this class is the zero-code-change deployment path.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.MaxRowByLongName),
      new ExpressionInfo(classOf[MaxRowByLong].getName, GraftFunctions.MaxRowByLongName),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2,
          s"${GraftFunctions.MaxRowByLongName}(value, ord) takes 2 args")
        MaxRowByLong(exprs.head, exprs(1))
      }))
  }
}
