package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.RefQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0.  q92 composes the whole library's dedup last mile:
    * MinHash-LSH pairs → connected-component closure → per-cluster
    * survivor pick → broadcast anti-join filter of the corpus →
    * quality gate → deterministic split → per-split stats. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.PipelineQueries.q92(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefQueries.all ++ graft.queries.PipelineQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RefQueries.oracles ++ graft.queries.PipelineQueries.oracles
}
