package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter for fast local
    // single-query oracle checks (the driver always passes two args)
    val only: Option[Set[String]] = args.lift(2).map(_.split(',').toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_NO_CODEGEN=1: run the whole dump fully interpreted
    // (wholeStage off, NO_CODEGEN factories) so the DuckDB compare can
    // certify the eval() path of every native expression — the dual-path
    // parity mode (see CodegenSuiteParitySpec for the in-JVM gate)
    val noCodegen = sys.env.get("SPARK_GRAFT_NO_CODEGEN").contains("1")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet has TIMESTAMP(NANOS) — readable only as raw longs;
      // Tables.events converts back to TimestampType (µs-aligned values).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // single-file fixtures: without a low split size every scan (and
      // every map-side persist of a scan) packs into 1-2 tasks — at sf1
      // that made shingle staging single-threaded (a 100-TB input is
      // thousands of files, so this is a fixture artifact to neutralize,
      // not a production setting)
      .config("spark.sql.files.maxPartitionBytes", "4m")
    val spark = (if (noCodegen)
      builder.config("spark.sql.codegen.wholeStage", "false")
        .config("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (noCodegen) System.err.println(
      "[verify] NO_CODEGEN mode: all queries run interpreted")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // repartition(1), NOT coalesce(1): coalesce fuses into the final
      // stage and runs the whole post-shuffle compute in ONE task (at
      // sf1 that turned x03's candidate verification into a single-
      // threaded hour); repartition inserts a shuffle boundary so the
      // query runs at full parallelism and only the RESULT rows funnel
      // into the single writer task
      try fn(spark, sfDir).repartition(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // queries persist() intermediates they self-join; without a
      // per-query clear those caches accumulate across all ~65 queries
      // in this one JVM and eventually GC-thrash the driver heap
      finally spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
