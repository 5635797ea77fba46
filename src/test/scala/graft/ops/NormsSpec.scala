package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** P5/P6 fixtures from FIXTURES.md: double-encoded arrays, naive vs
  * Z-suffixed timestamps, exact-cents conversion. */
class NormsSpec extends SparkSpec {
  import spark.implicits._

  test("double-encoded JSON arrays decode (market_discovery.py:85-95 quirk)") {
    val out = Seq("""["0.125","0.875"]""", """["tok1","tok2"]""", "not json")
      .toDF("s").select(Norms.decodeJsonArray(col("s")).as("a"))
      .collect().map(r => Option(r.getSeq[String](0)))
    assert(out(0).get === Seq("0.125", "0.875"))
    assert(out(1).get === Seq("tok1", "tok2"))
    assert(out(2).isEmpty) // malformed → null, not an error
  }

  test("naive and Z-suffixed ISO-8601 normalize to the same UTC instant") {
    val out = Seq("2026-02-13 10:15:00", "2026-02-13T10:15:00Z",
        "2026-02-13T10:15:00+00:00")
      .toDF("s").select(Norms.isoTs(col("s")).cast("long").as("t"))
      .collect().map(_.getLong(0))
    assert(out.distinct.length === 1)
  }

  test("cents conversion is exact for cent-valued doubles") {
    val vals = Seq(0.01, 0.1, 1.1, 123.45, 0.07, 999999.99, 0.0)
    val out = vals.toDF("v").select(Norms.cents(col("v")).as("c"))
      .collect().map(_.getLong(0))
    assert(out.toSeq === Seq(1L, 10L, 110L, 12345L, 7L, 99999999L, 0L))
  }

  test("safeDiv guards zero denominators") {
    val out = Seq((1L, 0L), (1L, 2L)).toDF("n", "d")
      .select(Norms.safeDiv(col("n"), col("d"))).collect().map(_.getDouble(0))
    assert(out.toSeq === Seq(0.0, 0.5))
  }
}
