package graft.silver

import org.apache.spark.sql.{DataFrame, SparkSession}

/** D3/D4: source registrations + layer materialization policy, the
  * analog of the reference's dbt configuration
  * (`data/polymarket_analytics/models/bronze/sources.yml:1-27` source
  * declarations; `dbt_project.yml:32-47` bronze=view, silver/gold=table).
  *
  * Bronze stays schema-on-read: temp views over the raw storage — zero
  * copies, always current. Silver/gold are MATERIALIZED parquet tables:
  * queried repeatedly, so they pay the write once and give downstream
  * scans columnar pruning + statistics. `spark.sql(...)` over these views
  * is the engine's SQL surface (the dbt-model equivalent).
  */
object Catalog {

  val bronzeTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every raw table as a temp view (bronze = view policy). */
  def registerBronze(spark: SparkSession, dir: String): Unit =
    bronzeTables.foreach { t =>
      graft.Tables.t(spark, dir, t).createOrReplaceTempView(t)
      if (t == "events") // events needs the ns→µs ts normalization
        graft.Tables.events(spark, dir).createOrReplaceTempView(t)
    }

  /** Materialize a silver/gold table (table policy): write parquet once,
    * re-register the view over the materialized data. */
  def materialize(spark: SparkSession, df: DataFrame, path: String,
                  view: String): DataFrame = {
    df.write.mode("overwrite").parquet(path)
    val back = spark.read.parquet(path)
    back.createOrReplaceTempView(view)
    back
  }
}
