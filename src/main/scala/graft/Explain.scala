// Dev tool: print the formatted physical plan of registered queries.
// Usage (single, to stdout):
//   java -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Explain q05_region_revenue [sfDir]
// Usage (batch, one file per query — one JVM/session for the whole set):
//   java -cp ... graft.Explain --out <dir> --suffix _after.txt [--sf <sfDir>] q30_... q36_...
package graft

import org.apache.spark.sql.SparkSession

object Explain {
  def main(args: Array[String]): Unit = {
    val (flags, names) = {
      var out: Option[String] = None; var suffix = ".txt"
      var sfDir = "/root/testdata/sf0.01"
      val rest = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < args.length) {
        args(i) match {
          case "--out" => out = Some(args(i + 1)); i += 2
          case "--suffix" => suffix = args(i + 1); i += 2
          case "--sf" => sfDir = args(i + 1); i += 2
          case a => rest += a; i += 1
        }
      }
      ((out, suffix, sfDir), rest.toSeq)
    }
    val (out, suffix, sfDir) = flags
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    out match {
      case None =>
        val name = names.headOption.getOrElse(sys.error("query name required"))
        val sf = if (names.length > 1) names(1) else sfDir
        SparkEntry.queries(name)(spark, sf).explain("formatted")
      case Some(dir) =>
        new java.io.File(dir).mkdirs()
        names.foreach { name =>
          val f = new java.io.File(dir, s"$name$suffix")
          val ps = new java.io.PrintStream(new java.io.FileOutputStream(f), true, "UTF-8")
          try {
            Console.withOut(ps) {
              println(s"== $name  (sf=$sfDir) ==")
              SparkEntry.queries(name)(spark, sfDir).explain("formatted")
            }
          } catch {
            case t: Throwable => ps.println(s"EXPLAIN FAILED for $name: $t")
          } finally ps.close()
          // release any per-query scoped caches so later plans are clean
          graft.functions.CacheScope.drain(); graft.functions.CacheScope.drainCheckpoints()
          System.err.println(s"[explain] wrote ${f.getPath}")
        }
    }
    spark.stop()
  }
}
