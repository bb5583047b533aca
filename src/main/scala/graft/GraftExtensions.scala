package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CdcBoundaries, CosineSimilarity, L2Distance, TokenizeGenerator}

/** SparkSessionExtensions entry point: installs the engine's native
  * functions into any session at build time —
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * This is the deployment path for a shared cluster: functions resolve
  * in every session (SQL, thrift-server, notebooks) without per-session
  * registration calls. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // rewrite the HOF dot-product idiom into the fused codegen'd form,
    // then collapse dot/sqrt(dot*dot) into one CosineSimilarity loop
    ext.injectOptimizerRule(_ => graft.plans.FuseDotProduct)
    ext.injectOptimizerRule(_ => graft.plans.FuseCosine)
    // SQL UPDATE / MERGE INTO on graft tables: lower the resolved
    // UpdateTable/MergeIntoTable nodes (which Spark only rewrites for
    // SupportsRowLevelOperations tables) to copy-on-write commands —
    // the Delta interception point
    ext.injectPostHocResolutionRule(_ => graft.sources.GraftDml)
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two float/double arrays"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_l2"),
      info("graft_l2", "graft_l2(a, b) - Euclidean distance of two float/double arrays"),
      (exprs: Seq[Expression]) => L2Distance(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_tokenize"),
      info("graft_tokenize", "graft_tokenize(text) - one row per whitespace token"),
      (exprs: Seq[Expression]) => TokenizeGenerator(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_cdc_bounds"),
      info("graft_cdc_bounds",
        "graft_cdc_bounds(text) - content-defined-chunking boundary count (8-char poly window mod 64)"),
      (exprs: Seq[Expression]) => CdcBoundaries(exprs.head)))
  }
}
