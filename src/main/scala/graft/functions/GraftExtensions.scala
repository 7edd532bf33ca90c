package graft.functions

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension installer: `SparkSession.builder()
  * .withExtensions(new GraftExtensions)` or cluster-wide via
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  * Injects the engine's native expressions into the function registry so
  * plain SQL (`SELECT float_dot(a, b)`) resolves them on every executor,
  * plus the opt-in deterministic-sum optimizer rule
  * (`spark.graft.deterministicSum=true`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.DeterministicSumRule)
  }
}
