package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.GraftFunctions

/** Cluster-deployment function injection: set
  * `spark.sql.extensions=graft.GraftExtensions` on spark-submit and every
  * graft function (graft_minhash, graft_cosine, graft_topk, …) is available
  * in pure SQL in every session — no application-side `ensure` call.
  *
  * Delegates to the exact builder list `GraftFunctions.ensure` uses, so the
  * two registration surfaces cannot diverge. (Interactive sessions created
  * through GraftSession use `ensure`; this route covers SQL-only clients —
  * JDBC/Thrift, notebooks pointed at a shared cluster.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      extensions.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
}
