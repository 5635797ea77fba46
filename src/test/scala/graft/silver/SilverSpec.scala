package graft.silver

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** D2 incremental semantics: the watermark comes from the TARGET table
  * (dbt `{{ this }}`), selecting "rows not yet loaded" — NOT "last N
  * days of source", which a source-side max would give. */
class SilverSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("incrementalAfter filters on the TARGET's high watermark, not the source's") {
    // source spans Jan 1..10; target loaded through Jan 4
    val source = (1 to 10).map(d => (d.toLong, ts(f"2024-01-$d%02d 00:00:00")))
      .toDF("id", "ingested_at")
    val target = source.filter(col("id") <= 4)
    val got = Silver.incrementalAfter(source, target, col("ingested_at"), "2 DAYS")
      .select("id").as[Long].collect().sorted
    // hwm = Jan 4; grace 2d → rows after Jan 2: ids 3..10.
    // Source-side hwm (Jan 10) would keep only ids 9,10 — the drift the
    // target-side contract exists to prevent.
    assert(got.toSeq === (3L to 10L))
  }

  test("incrementalAfter on an empty target passes everything (first load)") {
    val source = (1 to 5).map(d => (d.toLong, ts(f"2024-01-$d%02d 00:00:00")))
      .toDF("id", "ingested_at")
    val target = source.filter(col("id") < 0)
    val got = Silver.incrementalAfter(source, target, col("ingested_at"), "2 DAYS")
      .count()
    assert(got === 5L)
  }
}
