package graft

import graft.pipeline.{Export, Restore}
import org.apache.spark.sql.SparkSession

/** Minimal CLI over the pipeline — the engine's analog of the
  * reference's `frdbackup export|import` dispatch (frdbackup:12-35,
  * AbstractCommand.php:37-74): a plain match over commands instead of
  * namespace reflection, Spark instead of a single-threaded HTTP loop.
  *
  *   runMain graft.Cli export <treesJsonDir> <backupDir> [subtreePath]
  *     treesJsonDir: text files, one JSON document per line;
  *     subtreePath scopes the backup to one node (default "/")
  *   runMain graft.Cli import <backupDir> <outParquetDir>
  *     (file-based sink: re-materializes the leaf rows; a live sink
  *      implements pipeline.Restore.KVSink instead)
  *   runMain graft.Cli migrate <refTarGzGlob> <backupDir>
  *     (a backup archive produced by the REFERENCE PHP tool becomes a
  *      native engine backup — pipeline.Archive)
  *   runMain graft.Cli query <name> <sfDir>
  */
object Cli {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    args.toList match {
      case "export" :: in :: out :: rest if rest.lengthCompare(1) <= 0 =>
        // optional 4th arg: subtree node, the reference's path scope
        val node = rest.headOption.getOrElse("/")
        val trees = spark.read.textFile(in).map(j => ("/", j))
        Export.writeBackup(Export.subtree(
          Export.flattenTrees(trees.toDF("root", "json")
            .as[(String, String)]), node), out)
        println(s"exported $node -> $out")
      case "import" :: in :: out :: Nil =>
        Export.readBackup(spark, in)
          .write.mode("overwrite").parquet(out)
        println(s"imported -> $out")
      case "export-archive" :: in :: out :: Nil =>
        // inverse of migrate: a native engine backup becomes a
        // reference-format tar.gz the PHP tool's import can restore
        graft.pipeline.Archive.writeReferenceArchive(
          Export.readBackup(spark, in), out)
        println(s"exported reference archive $in -> $out")
      case "migrate" :: in :: out :: Nil =>
        // a tar.gz (glob) produced by the REFERENCE tool becomes a
        // native engine backup: archive -> leaf edges -> range-
        // partitioned parquet + manifest
        Export.writeBackup(
          graft.pipeline.Archive.readReferenceArchive(spark, in), out)
        println(s"migrated $in -> $out")
      case "query" :: name :: sfDir :: Nil =>
        SparkEntry.queries.get(name) match {
          case Some(fn) => fn(spark, sfDir).show(50, truncate = false)
          case None =>
            System.err.println(s"unknown query '$name'; available: " +
              SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
            sys.exit(2)
        }
      case _ =>
        System.err.println(
          "usage: graft.Cli export <treesJsonDir> <backupDir> [subtreePath] | " +
            "import <backupDir> <outParquetDir> | " +
            "migrate <refTarGzGlob> <backupDir> | " +
            "export-archive <backupDir> <outTarGz> | query <name> <sfDir>")
        sys.exit(2)
    }
    spark.stop()
  }
}
