package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query from SURVEY.md §2B.
  *
  * @param name   stable key (drives CORRECTNESS_r{N}.json per-query rows)
  * @param run    DataFrame-side implementation; args = (session, sfDir)
  * @param oracle equivalent DuckDB SQL over the same tables; None → the
  *               driver records a weaker rows-only check (streaming /
  *               sketch queries whose semantics DuckDB can't replay)
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object QueryDef {
  /** Build from a (runner, oracle) pair — the "same SQL text on both
    * engines" idiom of SqlQueries. */
  def apply(name: String,
            both: ((SparkSession, String) => DataFrame, Option[String])): QueryDef =
    new QueryDef(name, both._1, both._2)
}

trait QueryRegistry {
  def defs: Seq[QueryDef]
}
