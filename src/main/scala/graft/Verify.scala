package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional dev filter: args beyond <sfDir> <outDir> restrict the dump
    // to those queries (the driver invokes with exactly two args)
    val Array(sfDir, outDir, rest @ _*) = args
    val only: Set[String] = rest.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // expected unpersist-of-checkpoint WARN spam — see Bench's note
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
    new java.io.File(outDir).mkdirs()
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    // per-query outcome for summary.json: rows written (or -1 on failure)
    // and wall seconds — so an empty/absent driver-side CORRECTNESS file
    // is diagnosable from the round snapshot alone (r10 postmortem).
    val outcomes = scala.collection.mutable.LinkedHashMap[String, (Long, Double)]()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      // operators cache intermediates internally; clear between queries
      // so 100+ corpus-scale cached tables can't accumulate and spill
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // row count from the written file's parquet footer — no recompute
        val rows = spark.read.parquet(s"$outDir/$name").count()
        outcomes(name) = (rows, (System.nanoTime() - t0) / 1e9)
      }
      catch { case e: Throwable =>
        // A query that fails to run must NOT silently vanish from the
        // round's correctness results (it did in r5, masking a 20-query
        // regression): write a sentinel one-row parquet so the driver's
        // compare records an explicit mismatch for this name instead of
        // omitting it, and collect the error for errors.json below.
        val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"
        System.err.println(s"[verify] $name failed: $msg")
        failures(name) = msg
        outcomes(name) = (-1L, (System.nanoTime() - t0) / 1e9)
        try {
          import spark.implicits._
          Seq(msg).toDF("verify_error").coalesce(1)
            .write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => () }
      }
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
    // Machine-readable failure manifest + loud summary: a clean run has
    // an empty {} here, so any non-empty content is itself the signal.
    val errJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    // Builder-owned per-query summary: rows + engine wall seconds per
    // query, written even when the driver's own compare never lands
    // (CORRECTNESS_r10.json came back empty while the engine was green —
    // this file makes that failure mode diagnosable from the snapshot).
    val summary = outcomes.map { case (k, (rows, sec)) =>
      s"${q(k)}: {\"rows\": $rows, \"sec\": ${f"$sec%.2f"}}"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/summary.json"), summary)
    System.err.println(
      s"[verify] ${outcomes.size} queries dumped, ${failures.size} failed; summary.json written")
    if (failures.nonEmpty)
      System.err.println(
        s"[verify] ${failures.size} queries FAILED to run: ${failures.keys.mkString(", ")}")
    spark.stop()
  }
}
