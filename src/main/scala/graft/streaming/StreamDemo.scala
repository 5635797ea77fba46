package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Usage demo / smoke driver for the streaming layer: wires the built-in
  * rate source (a real unbounded streaming source) through the throttle
  * and windowed-agg operators into memory sinks, runs a few seconds of
  * micro-batches, and prints what landed plus the listener's counters.
  * The Kafka wiring in Pipelines is identical modulo format("kafka"). */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val counters = Observability.attach(spark)

    // 50 events/s, keyed 0-4: decimate to the latest value per (key, second)
    val src = spark.readStream.format("rate").option("rowsPerSecond", "50").load()
      .select((col("value") % 5).as("k"), col("timestamp").as("ts"), col("value").as("v"))
    val q1 = Pipelines.throttle(src, "ts", "10 seconds", "1 second",
        Seq(col("k")), Seq("v" -> col("v")))
      .writeStream.format("memory").queryName("demo_throttle")
      .outputMode("update").start()

    val q2 = Pipelines.windowedAgg(src, "ts", "5 seconds", "10 seconds",
        Seq(col("k")), Seq(count(lit(1)).as("n"), max(col("v")).as("max_v")))
      .writeStream.format("memory").queryName("demo_window")
      .outputMode("update").start()

    Thread.sleep(8000)
    q1.processAllAvailable(); q2.processAllAvailable()
    val throttled = spark.table("demo_throttle").count()
    val raw = counters.rows("demo_throttle")
    println(s"[demo] raw rows seen by throttle query: $raw")
    println(s"[demo] decimated (key,second) rows:     $throttled")
    println(s"[demo] windowed agg rows: ${spark.table("demo_window").count()}")
    spark.table("demo_window").orderBy(desc("win_start")).show(5, truncate = false)
    q1.stop(); q2.stop()
    spark.stop()
    assert(throttled > 0 && raw >= throttled,
      "decimation must reduce (or match) the raw row count")
  }
}
