package graft

import graft.pipeline.{Bucketed, Export}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-vs-plain snapshot-diff rehearsal — the measured counterpart
  * of BucketingSpec's plan assertion ("bucketed diff drops the digest
  * exchanges").
  *
  * The incremental-backup story at 100 TB is: snapshots are WRITTEN
  * bucketed+sorted by (path, key) (`Bucketed.writeBackupTable`), so the
  * recurring daily diff full-outer joins two co-partitioned tables with
  * zero Exchange — the shuffle was paid once at write time. This main
  * times all three legs at 1x and Kx on the ScaleSmoke-replicated
  * corpus: the plain-parquet diff (digest shuffle every run), the
  * bucketed WRITE (the pre-paid cost), and the bucketed diff (the
  * recurring cost). Broadcast joins are disabled so the digest join is
  * the sort-merge join it is at corpus scale — at test sizes the
  * planner would broadcast one side and hide exactly the exchange this
  * measurement exists to show removed.
  *
  * Usage: runMain graft.DiffSmoke [k] [srcDir] [workDir]
  * Prints ONE JSON line: per scale, seconds for plain / write / bucketed.
  */
object DiffSmoke {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 32
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    // the default work dir is k-specific: reusing one dir across
    // different k would silently time the OLD replication factor under
    // the new k's label (an explicit workDir arg is trusted as-is)
    val work = if (args.length > 2) args(2) else s"/tmp/graft_diff_smoke_$k"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // gate reuse on the LAST table replicate() writes (embeddings),
    // including its _SUCCESS marker — bare existence of the first
    // table would silently reuse a partial corpus from an interrupted
    // prior run and time the diff legs under the wrong k
    if (!new java.io.File(s"$work/embeddings.parquet/_SUCCESS").exists())
      ScaleSmoke.replicate(spark, src, work, k)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def force(df: DataFrame): Unit = df.queryExecution.toRdd.foreach(_ => ())
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf2(f: => Unit): Double = math.min(time(f), time(f))

    val legs = Seq("1x" -> src, s"${k}x" -> work).map { case (tag, dir) =>
      val ord = Tables.orders(spark, dir)
      val prev = operators.Incremental.prevSnap(ord)
      val cur = operators.Incremental.curSnap(ord)
      val tPlain = minOf2(force(Export.diffBackups(prev, cur)))
      // the pre-paid cost: one bucketed write per snapshot (in
      // production the EXPORT writes this layout directly, so this leg
      // is not additional work — it replaces the plain parquet write)
      val tWrite = time {
        Bucketed.writeBackupTable(prev, s"dsm_prev_$tag", cpus.toInt)
        Bucketed.writeBackupTable(cur, s"dsm_cur_$tag", cpus.toInt)
      }
      val tBucketed = minOf2(force(Export.diffBackups(
        spark.table(s"dsm_prev_$tag"), spark.table(s"dsm_cur_$tag"))))
      spark.sql(s"DROP TABLE IF EXISTS dsm_prev_$tag")
      spark.sql(s"DROP TABLE IF EXISTS dsm_cur_$tag")
      f""""$tag":{"plain":$tPlain%.3f,"bucketed_write":$tWrite%.3f,""" +
        f""""bucketed_diff":$tBucketed%.3f}"""
    }
    println(s"""{"metric":"diff_smoke","k":$k,${legs.mkString(",")}}""")
    spark.stop()
  }
}
