package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

final case class Tick(k: Long, ts: Timestamp, v: Long)

/** Streaming wiring driven via MemoryStream: throttle decimation,
  * watermarked windows, bronze foreachBatch sink with date partitions,
  * progress counters. The SAME operator shapes as the batch layer, run
  * inside streaming queries (the batch form is the correctness surface;
  * these tests pin the streaming wrapping). */
class PipelinesSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming throttle emits the latest value per (key, minute)") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val in = MemoryStream[Tick]
    val out = Pipelines.throttle(in.toDF(), "ts", "10 minutes", "1 minute",
      Seq(col("k")), Seq("v" -> col("v")))
    val q = out.writeStream.format("memory").queryName("throttle_out")
      .outputMode("update").start()
    try {
      in.addData(Tick(1L, ts("2026-01-01 00:00:05"), 10L),
        Tick(1L, ts("2026-01-01 00:00:40"), 20L),
        Tick(2L, ts("2026-01-01 00:00:50"), 30L))
      q.processAllAvailable()
      val rows = spark.table("throttle_out")
        .select("k", "v").as[(Long, Long)].collect().toSet
      assert(rows === Set((1L, 20L), (2L, 30L)))
    } finally q.stop()
  }

  test("watermarked window closes and emits once late data horizon passes (W1/W6)") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val in = MemoryStream[Tick]
    val agg = Pipelines.windowedAgg(in.toDF(), "ts", "1 minute", "15 minutes",
      Seq(col("k")), Seq(count(lit(1)).as("n"), sum(col("v")).as("vol")))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      in.addData(Tick(1L, ts("2026-01-01 00:01:00"), 5L),
        Tick(1L, ts("2026-01-01 00:14:00"), 7L))
      q.processAllAvailable()
      // window [00:00,00:15) not closed yet — append emits nothing
      assert(spark.table("win_out").count() === 0)
      // an event far past the window + watermark closes it
      in.addData(Tick(1L, ts("2026-01-01 00:31:00"), 1L))
      q.processAllAvailable()
      val rows = spark.table("win_out").select("k", "n", "vol")
        .as[(Long, Long, Long)].collect().toSet
      assert(rows === Set((1L, 2L, 12L)))
    } finally q.stop()
  }

  test("bronze foreachBatch sink lands date-partitioned parquet (K2/D5)") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val dir = Files.createTempDirectory("graft_bronze_test").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val in = MemoryStream[Tick]
    val q = Pipelines.bronzeSink(in.toDF(), s"$dir/data", ckpt, tsCol = "ts").start()
    try {
      in.addData(Tick(1L, ts("2026-01-01 10:00:00"), 1L),
        Tick(2L, ts("2026-01-02 10:00:00"), 2L))
      q.processAllAvailable()
      val back = spark.read.parquet(s"$dir/data")
      assert(back.count() === 2)
      assert(back.select("ingest_date").distinct().count() === 2)
      // partition pruning works on the landed layout
      assert(back.filter(col("ingest_date") === "2026-01-01").count() === 1)
    } finally q.stop()
  }

  test("progress listener counts rows without hot-path instrumentation (A9)") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val counters = Observability.attach(spark)
    val in = MemoryStream[Tick]
    val q = in.toDF().groupBy("k").count()
      .writeStream.format("memory").queryName("obs_out")
      .outputMode("complete").start()
    try {
      in.addData(Tick(1L, ts("2026-01-01 00:00:00"), 1L),
        Tick(1L, ts("2026-01-01 00:00:01"), 2L), Tick(2L, ts("2026-01-01 00:00:02"), 3L))
      q.processAllAvailable()
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 10000
      while (counters.rows("obs_out") < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(counters.rows("obs_out") === 3L)
      assert(counters.batches("obs_out") >= 1L)
    } finally {
      q.stop()
      spark.streams.removeListener(counters)
    }
  }
}
