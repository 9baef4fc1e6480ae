package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.GraftFunctions

/** SparkSessionExtensions entry point — the zero-code way to get the
  * whole graft surface (native SimHash64/MinHash64 expressions + the
  * ClickHouse-dialect function names) in any session:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  *
  * Builtins are never shadowed: descriptors are injected only for
  * names Spark does not define (injectFunction would otherwise replace
  * them for the session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
    GraftFunctions.descriptors
      .filterNot { case (id, _, _) =>
        FunctionRegistry.builtin.functionExists(id)
      }
      .foreach(ext.injectFunction)
    // projection auto-selection: matching aggregates over a table with
    // a declared PROJECTION read the materialized summary instead
    ext.injectOptimizerRule(session => graft.plans.ProjectionRewrite(session))
    // transform(arr, x -> casts(x)) → array-level Cast (codegen'd)
    ext.injectOptimizerRule(session => graft.plans.CastTransformRewrite(session))
  }
}
