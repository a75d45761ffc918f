package graft

import scala.concurrent.duration._

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hot-shingle skew audit of the bucketed delta-dedup probe — the r14
  * verdict's ask #5 — EXTENDED (r16, the r15 verdict's ask #5) with
  * the lexical index, whose skew exposure is structurally worse:
  * shingle hashes decorrelate content frequency from bucket placement
  * (measured 1.01x at 5.12M docs), but BM25 postings follow Zipf — a
  * stop-word's posting list IS a hot bucket by construction (every
  * occurrence of one term hashes to ONE bucket). The lexical section
  * measures per-bucket postings rows, the term-df tail, and per-task
  * durations during a real bm25IndexedScores probe; the same > 4x
  * max/median task-time threshold decides whether the documented
  * df-based stop-term cap is warranted.
  * This main measures, on a (replicated) corpus dir at its scaled
  * bucket count:
  *
  *  - per-bucket POSTINGS row counts (read from the one-file-per-
  *    bucket layout a fresh build writes — file name carries the
  *    bucket id), max/median ratio = stored skew;
  *  - the df tail (top shingle frequencies vs the mean) = the
  *    hot-shingle shape itself;
  *  - per-task DURATIONS of the probe's heaviest stages via a
  *    SparkListener during a real `deltaDedup` probe, max/median
  *    ratio = the skew that actually lands on the wall clock.
  *
  * The mitigation threshold (documented in SURVEY): max/median task
  * time > 4x on the probe stage warrants a df-based stop-shingle cap
  * (the rarity stats already exist in the df table); below it, the
  * uniform-hash spread of ~10^2 distinct shingles per doc is doing
  * its job and a cap would only add a correctness-bearing knob.
  *
  * Usage: runMain graft.SkewAudit <corpusDir>
  */
object SkewAudit {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SkewAudit <corpusDir>")
    val dir = args(0)
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

    val (postT, _, dfT) = operators.Dedup.ensureShingleIndex(spark, dir)

    // stored skew: one file per bucket after a fresh build, so file
    // row counts ARE bucket row counts
    val BucketRe = "_(\\d{5})".r
    val perBucket = spark.table(postT)
      .groupBy(input_file_name().as("f")).count()
      .collect()
      .map(r => BucketRe.findFirstMatchIn(r.getString(0)).get
        .group(1).toInt -> r.getLong(1))
      .sortBy(-_._2)
    val rows = perBucket.map(_._2).sorted
    val rowMax = rows.last
    val rowMed = rows(rows.length / 2)

    // the hot-shingle tail itself
    val dfStats = spark.table(dfT)
      .agg(max("gdf").as("mx"), avg("gdf").as("mean"),
        count(lit(1)).as("distinct_shingles")).head
    val (dfMax, dfMean, nSh) =
      (dfStats.getLong(0), dfStats.getDouble(1), dfStats.getLong(2))

    // wall-clock skew: task durations per stage during a real probe
    val tasks = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null)
          tasks.add((t.stageId, t.taskInfo.duration))
    }
    spark.sparkContext.addSparkListener(listener)
    val (f, sh) = operators.Dedup.deltaDedup(spark, dir)
    val nPairs = f.count()
    sh.unpersist(blocking = false)
    // listener events are posted asynchronously; the bus API is
    // private, so drain with a bounded wait on the expected minimum
    // (the count() above ran >= 2 stages x >= cpus tasks)
    val deadline = System.nanoTime() + 10.seconds.toNanos
    while (tasks.size() < 2 && System.nanoTime() < deadline)
      Thread.sleep(100)
    Thread.sleep(1000)
    spark.sparkContext.removeSparkListener(listener)

    import scala.jdk.CollectionConverters._
    def stageStats(q: java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)])
        : (String, Double) = {
      val byStage = q.asScala.toSeq.groupBy(_._1)
        .map { case (st, ts) => (st, ts.map(_._2).sorted) }
        .toSeq.sortBy { case (_, ds) => -ds.sum }
      val stageJson = byStage.take(4).map { case (st, ds) =>
        val med = math.max(1L, ds(ds.length / 2))
        f"""{"stage":$st,"tasks":${ds.length},"total_ms":${ds.sum},"max_ms":${ds.last},"median_ms":$med,"max_over_median":${ds.last.toDouble / med}%.2f}"""
      }.mkString("[", ",", "]")
      val ratio = byStage.headOption.map { case (_, ds) =>
        ds.last.toDouble / math.max(1L, ds(ds.length / 2))
      }.getOrElse(0.0)
      (stageJson, ratio)
    }
    val (stageJson, probeRatio) = stageStats(tasks)

    // ---- lexical index (BM25 postings) ----
    val (lexPostT, _) = operators.Retrieval.ensureLexIndex(spark, dir)
    val lexPerBucket = spark.table(lexPostT)
      .groupBy(input_file_name().as("f")).count()
      .collect()
      .map(r => BucketRe.findFirstMatchIn(r.getString(0)).get
        .group(1).toInt -> r.getLong(1))
      .sortBy(-_._2)
    val lexRows = lexPerBucket.map(_._2).sorted
    val lexRowMax = lexRows.last
    val lexRowMed = lexRows(lexRows.length / 2)
    // the Zipf head itself: per-term posting-list lengths
    val lexDf = spark.table(lexPostT)
      .groupBy("th").agg(count(lit(1)).as("df"))
      .agg(max("df").as("mx"), avg("df").as("mean"),
        count(lit(1)).as("terms")).head
    val (lexDfMax, lexDfMean, lexTerms) =
      (lexDf.getLong(0), lexDf.getDouble(1), lexDf.getLong(2))
    val lexTasks = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]
    val lexListener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null)
          lexTasks.add((t.stageId, t.taskInfo.duration))
    }
    spark.sparkContext.addSparkListener(lexListener)
    val nScores = operators.Retrieval
      .bm25IndexedScores(spark, dir, operators.Retrieval.QueryTerms)
      .count()
    val lexDeadline = System.nanoTime() + 10.seconds.toNanos
    while (lexTasks.size() < 2 && System.nanoTime() < lexDeadline)
      Thread.sleep(100)
    Thread.sleep(1000)
    spark.sparkContext.removeSparkListener(lexListener)
    val (lexStageJson, lexProbeRatio) = stageStats(lexTasks)

    println(f"""{"metric":"skew_audit","dir":"$dir","buckets":${perBucket.length},"bucket_rows_max":$rowMax,"bucket_rows_median":$rowMed,"bucket_rows_ratio":${rowMax.toDouble / math.max(1L, rowMed)}%.2f,"distinct_shingles":$nSh,"df_max":$dfMax,"df_mean":$dfMean%.2f,"probe_pairs":$nPairs,"heaviest_stage_max_over_median":$probeRatio%.2f,"stages":$stageJson,"lex_buckets":${lexPerBucket.length},"lex_bucket_rows_max":$lexRowMax,"lex_bucket_rows_median":$lexRowMed,"lex_bucket_rows_ratio":${lexRowMax.toDouble / math.max(1L, lexRowMed)}%.2f,"lex_terms":$lexTerms,"lex_df_max":$lexDfMax,"lex_df_mean":$lexDfMean%.2f,"lex_scores":$nScores,"lex_heaviest_stage_max_over_median":$lexProbeRatio%.2f,"lex_stages":$lexStageJson}""")
    spark.stop()
  }
}
