package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level wall attribution for ONE kNN-graph batch fold — the
  * [[BuildProbe]] twin for the ingest path. With the cell-block
  * kernel the fold's SCORING cost collapsed (window 104 s -> kernel
  * ~30 s per 2k-vector batch at 512k), so the residual wall is now
  * fixed per-fold machinery — ring-cell scans, the touched/reverse
  * resolve, the threshold pass, two bucketed writes, manifest I/O —
  * spread across many small jobs where scheduler latency, not data,
  * may dominate. Optimizing that residual without attribution would
  * repeat the r17 mistake the verdict called out (chunk-count tuning
  * aimed at a non-cost); this main measures which stages actually
  * hold the ~30 s before anyone touches the fold again.
  *
  * Runs the ensures un-instrumented (setup, not fold cost), builds a
  * fresh-id batch from corpus vectors (the AppendSmoke vstripe
  * idiom), attaches a stage listener around ONE
  * [[operators.Similarity.appendToKnnGraphIndex]] call, and prints
  * one line per stage (wall, summed task time, tasks, input bytes,
  * shuffle read/write, spill, call site) plus a JSON summary.
  *
  * Usage: runMain graft.FoldProbe <corpusDir> [k] [batchVecs] [runTag]
  *        [mode]
  * (runTag separates repeat probes on one work dir: it salts both the
  * fresh-id stripe and the batchId, so each probe is a FIRST fold.)
  *
  * `mode`: `corpus` (default) draws the batch from an arbitrary
  * corpus slice — its rings union to ~ALL cells, the deliberate
  * worst case every prior fold number was measured at. `cell` draws
  * the batch from ONE similarity neighborhood (the top-`batchVecs`
  * cosine mates of vector 0 — a correlated ingest, e.g. one crawl
  * shard): rings overlap heavily, so the fold's mates scan and
  * reverse resolve should prune to ~np of nlist cells — the
  * production-shaped claim the r18 verdict asked to measure rather
  * than argue. Both modes report ring_cells/nlist (read from the
  * rings table after the fold) so the pruning is a recorded number.
  */
object FoldProbe {
  private class Agg {
    var name = ""
    var wallMs = 0L
    var taskMs = 0L
    var tasks = 0
    var input = 0L
    var sr = 0L
    var sw = 0L
    var spill = 0L
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: FoldProbe <corpusDir> [k] [batchVecs]")
    val dir = args(0)
    val k = if (args.length > 1) args(1).toInt else 3
    val batchVecs = if (args.length > 2) args(2).toInt else 2000
    val runTag = if (args.length > 3) args(3) else "a"
    require(runTag.matches("[A-Za-z0-9_.\\-]+"),
      s"runTag must match [A-Za-z0-9_.-]+ (manifest round-trip): $runTag")
    val mode = if (args.length > 4) args(4) else "corpus"
    require(mode == "corpus" || mode == "cell",
      s"mode must be corpus|cell: $mode")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.GraftFunctions.register(spark)

    val t0 = System.nanoTime()
    operators.Similarity.ensureIvfIndex(spark, dir)
    operators.Similarity.ensureKnnGraphIndex(spark, dir, k)
    val ensureWall = (System.nanoTime() - t0) / 1e9

    val emb = Tables.embeddings(spark, dir)
    val maxVec = emb.agg(max("vec_id")).head.getLong(0)
    // fresh ids disjoint from everything indexed (the append guard);
    // the 9001+ stripe region sits far above AppendSmoke's small-k
    // stripes, and the tag hash separates repeat probes (a collision
    // just trips the loud disjointness guard)
    val stripe = 9001L + math.abs(runTag.hashCode % 100000)
    val batchSrc: DataFrame =
      if (mode == "corpus") emb.limit(batchVecs)
      else {
        // ONE direction: batchVecs exact copies of vector 0 (fresh
        // ids) — every member's probe ring is the SAME np cells, so
        // the fold's mates scan and blocks must prune to ~np/nlist
        // of the corpus (the concentrated-ingest shape: one crawl
        // shard of near-dups). The first cut used the top-batchVecs
        // cosine NEIGHBORHOOD of v0 instead, and on a random-
        // direction corpus that is ~15 directions whose np-rings
        // union to ALL cells — ring_cells == occupied_cells, no
        // pruning to measure.
        val v0 = emb.filter(col("vec_id") === 0L)
          .select(col("embedding")).head.getSeq[Float](0).toArray
        spark.range(batchVecs).select(col("id").as("vec_id"),
          typedLit(v0).as("embedding"))
      }
    val batch: DataFrame = batchSrc
      .select((col("vec_id") + lit((maxVec + 1) * stripe)).as("vec_id"),
        col("embedding"))
      .localCheckpoint()

    val stages =
      new java.util.concurrent.ConcurrentHashMap[Int, Agg]()
    def agg(id: Int) = stages.computeIfAbsent(id, _ => new Agg)
    val listener = new SparkListener {
      override def onStageCompleted(
          e: SparkListenerStageCompleted): Unit = {
        val a = agg(e.stageInfo.stageId)
        a.name = e.stageInfo.name.linesIterator.next()
        a.wallMs = (for {
          s <- e.stageInfo.submissionTime
          c <- e.stageInfo.completionTime
        } yield c - s).getOrElse(0L)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          val a = agg(e.stageId)
          a.synchronized {
            a.taskMs += m.executorRunTime
            a.tasks += 1
            a.input += m.inputMetrics.bytesRead
            a.sr += m.shuffleReadMetrics.totalBytesRead
            a.sw += m.shuffleWriteMetrics.bytesWritten
            a.spill += m.diskBytesSpilled
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t1 = System.nanoTime()
    val applied = operators.Similarity.appendToKnnGraphIndex(
      spark, dir, k, batch, s"foldprobe_${batchVecs}_$runTag")
    val foldWall = (System.nanoTime() - t1) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    require(applied, "fold probe batch was already applied — use a " +
      "fresh work dir (the probe measures a FIRST fold)")

    def mb(b: Long) = math.rint(b / 1e5) / 10
    import scala.jdk.CollectionConverters._
    val rows = stages.asScala.toSeq.sortBy(-_._2.wallMs)
    println(f"${"stage"}%6s ${"wall_s"}%8s ${"task_s"}%8s " +
      f"${"tasks"}%6s ${"in_MB"}%9s ${"sRd_MB"}%9s ${"sWr_MB"}%9s " +
      f"${"spill_MB"}%9s  site")
    rows.take(40).foreach { case (id, a) =>
      println(f"$id%6d ${a.wallMs / 1e3}%8.1f ${a.taskMs / 1e3}%8.1f " +
        f"${a.tasks}%6d ${mb(a.input)}%9.1f ${mb(a.sr)}%9.1f " +
        f"${mb(a.sw)}%9.1f ${mb(a.spill)}%9.1f  ${a.name.take(90)}")
    }
    val totTask = rows.map(_._2.taskMs).sum / 1e3
    val totStageWall = rows.map(_._2.wallMs).sum / 1e3
    // ring coverage, read back from the rings table: how many cells
    // the batch's rings actually touched vs all occupied ring cells —
    // the cell-pruning evidence the `cell` mode exists for
    val (_, rt) = operators.Similarity.knngTableNames(dir, k)
    val rings = spark.table(rt)
    val batchCells = rings
      .join(batch.select(col("vec_id").as("qid")), Seq("qid"), "leftsemi")
      .select("qcid").distinct().count()
    val allCells = rings.select("qcid").distinct().count()
    println(s"""{"metric":"fold_probe","dir":"$dir","k":$k,""" +
      s""""mode":"$mode","ring_cells":$batchCells,""" +
      s""""occupied_cells":$allCells,""" +
      s""""batch_vecs":$batchVecs,""" +
      s""""ensure_wall_s":${math.rint(ensureWall * 10) / 10},""" +
      s""""fold_wall_s":${math.rint(foldWall * 100) / 100},""" +
      s""""stages":${rows.size},""" +
      s""""sum_stage_wall_s":${math.rint(totStageWall * 100) / 100},""" +
      s""""sum_task_s":${math.rint(totTask * 10) / 10}}""")
  }
}
