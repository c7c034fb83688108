package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.RefQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0.  q122 composes the library's full corpus-hygiene
    * pipeline: MinHash-LSH pairs → connected-component closure →
    * per-cluster survivor pick → broadcast anti-join corpus filter →
    * cross-document passage removal over the survivors → retrieval
    * decontamination over the cleaned text → quality gate re-scored
    * on the cleaned text → deterministic split → per-split stats. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.PipelineQueries.q122(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefQueries.all ++ graft.queries.PipelineQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RefQueries.oracles ++ graft.queries.PipelineQueries.oracles
}
