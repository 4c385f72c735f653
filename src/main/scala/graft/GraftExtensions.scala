package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `SparkSessionExtensions` entry point for the engine's native SQL
  * functions — the registration path for sessions the library code
  * never touches. A pure-SQL deployment (spark-sql shell, a
  * Thrift/Connect server, a notebook kernel) opts in with
  *
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  * and every session of that application resolves the graft functions,
  * including `newSession()` children — unlike
  * [[GraftSession.registerFunctions]], whose temp-function
  * registration is per-session and requires a library call. Both paths
  * read the same [[GraftSession.SqlFunctions]] table, so the SQL
  * surface cannot drift between them.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftSession.SqlFunctions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
    // naive band joins → bucketed range-join shape (idempotent; see
    // the rule's fences). Library sessions get the same rule via
    // experimental.extraOptimizations in GraftSession.get.
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
  }
}
