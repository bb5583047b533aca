package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All declared queries (SURVEY.md §2B), one registry per category. */
  val registries: Seq[QueryRegistry] = Seq(
    ScanQueries, JoinQueries, AggQueries, WindowQueries,
    SetQueries, ScalarQueries, SqlQueries, ModernSqlQueries,
    PipelineQueries, CurationQueries, UdxQueries, StreamingQueries,
    LakehouseQueries, TrainingQueries, CorpusQueries, AnalyticsQueries)

  val defs: Seq[QueryDef] = registries.flatMap(_.defs)

  /** Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q18_groupby_multi_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(sql => d.name -> sql)).toMap
}
