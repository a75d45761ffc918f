package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: the shuffle-avoidance story for repeated
  * fact-fact joins at scale (SURVEY.md "minimize shuffles").
  *
  * A sort-merge join of two large tables shuffles BOTH sides on every
  * query. Writing them bucketed by the join key (hash-partitioned files
  * + bucket metadata in the catalog) moves that shuffle to write time:
  * any number of subsequent joins/aggregations on the bucket key plan
  * with ZERO Exchange on the bucketed sides. This is the Spark-native
  * analog of the reference pre-ordering its export by key so restore
  * can replay without re-sorting (manifest-ordered replay,
  * RestoreProcessor.php:62-67). BucketingSpec asserts the no-Exchange
  * plan property.
  */
object Bucketed {

  /** Persist `df` as a bucketed catalog table on `key` (overwrites). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table) // default warehouse location

  /** Join two equally-bucketed tables on their bucket key — planner
    * sees compatible output partitioning and skips both exchanges. */
  def colocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Backup artifact as a catalog table bucketed AND sorted by
    * (path, key) — the incremental-backup storage layout. A snapshot
    * diff ([[Export.diffBackups]]) full-outer joins snapshots on
    * exactly (path, key): over two such tables the digest phase plans
    * with ZERO Exchange on either side (bucket-compatible
    * partitioning), so the recurring cost of a daily diff over a
    * mostly-unchanged corpus drops to two co-located scans — the
    * shuffle was paid once, at write time, like the reference
    * pre-ordering its export so restore replays without re-sorting
    * (RestoreProcessor.php:62-67). BucketingSpec asserts the
    * exchange-count drop vs the plain-parquet plan. */
  def writeBackupTable(rows: DataFrame, table: String,
                       buckets: Int = 8): Unit =
    rows.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "path", "key")
      .sortBy("path", "key")
      .format("parquet")
      .saveAsTable(table)
}
