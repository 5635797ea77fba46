package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from per-domain registries; each QueryDef pairs
  * the Spark implementation with the DuckDB oracle SQL the driver runs
  * over the same parquet tables.
  */
object SparkEntry {

  private def registries: Seq[QueryDef] =
    queries_impl

  private lazy val queries_impl: Seq[QueryDef] =
    graft.queries.CoreQueries.defs ++
      graft.queries.ExtraQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The orderbook-summary aggregation (SURVEY A1–A5) — the densest
    * computation in the reference hot path. */
  def entry(spark: SparkSession): DataFrame =
    queries("a05_book_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
