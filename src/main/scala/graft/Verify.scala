package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    // Optional dev-loop filter (args 3+): dump only the named queries.
    // The driver always passes exactly (sfDir, outDir) → full roster.
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // A failed query must leave NO output: when outDir is reused
        // across runs, a stale result directory from a previous run
        // would otherwise be compared as if it were this run's.
        val stale = new java.io.File(s"$outDir/$name")
        if (stale.exists()) {
          import scala.reflect.io.Directory
          new Directory(stale).deleteRecursively()
        }
      }
      finally {
        // Release this query's scoped caches (the operators register
        // every query-local persist via CacheScope), then clearCache
        // as the safety net for anything inline-managed that leaked
        // on an exception path.
        graft.functions.CacheScope.drain()
        graft.functions.CacheScope.drainCheckpoints()
        spark.catalog.clearCache()
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
    // The full registered-query roster, so the comparer can detect a
    // query that failed Spark-side (its output dir is deleted above):
    // without this, a comparer that iterates outDir silently skips
    // failures instead of counting them — the gap that let a fixture
    // schema change break 19 events queries invisibly.
    Files.writeString(Paths.get(s"$outDir/_registered.json"),
      SparkEntry.queries.keys.toSeq.sorted.map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
