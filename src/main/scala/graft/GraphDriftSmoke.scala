package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The graph-after-refresh economics, measured as ONE cycle — the r18
  * verdict's ask #4: DriftGate proves concentrated ingest drift
  * degrades IVF occupancy and that refreshIvfCentroids repairs it;
  * the graph manifest pins the quantizer fingerprint, so that refresh
  * makes the next graph ensure REBUILD (the documented staleness
  * contract). Those were two separate gates; this main records the
  * combined story at a real rung: cold build → concentrated drift
  * appends (IVF-only ingest, the graph lagging) → the maintenance
  * policy flags and refreshes unprompted → the graph ensure detects
  * the new quantizer and rebuilds over the merged corpus → tau-recall
  * of the rebuilt graph against brute truth over corpus + drift.
  *
  * Drift fixture: 4 clouds of fresh-id corpus vectors, 0.2-shrunk +
  * a unit axis offset (the DriftGate cloud shape — the corpus
  * embeddings are unit vectors, so each cloud is tight around e_j
  * and piles into one frozen cell). Clouds are sized to CELL scale —
  * 24x the mean occupancy n/nlist (rule 38: a corpus-FRACTION cloud
  * exits the trigger regime as nlist grows) — so each sits ~24x the
  * mean, past the 16x-median hot-cell trigger at every rung, while
  * the post-refresh layout is healthy and the kernel's block guard
  * stays silent — the guard fires exactly when someone SKIPS the
  * refresh this smoke measures.
  *
  * Usage: runMain graft.GraphDriftSmoke <replicaDir> [k] [floor]
  * Prints one JSON line; exits 1 when the policy fails to flag/settle
  * or tau-recall sits below `floor` (report-only at floor <= 0).
  */
object GraphDriftSmoke {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GraphDriftSmoke <replicaDir> [k] [floor]")
    val src = args(0)
    val k = if (args.length > 1) args(1).toInt else 3
    val floor = if (args.length > 2) args(2).toDouble else -1.0
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

    val work = s"/tmp/graft_graph_drift_${new java.io.File(src).getName}"
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(work), true)
    Tables.embeddings(spark, src)
      .write.parquet(s"$work/embeddings.parquet")
    operators.Similarity.dropIvfIndex(spark, work)
    operators.Similarity.dropKnnGraphIndex(spark, work, k)

    val emb = Tables.embeddings(spark, work)
    val n = emb.count()
    val maxVec = emb.agg(max("vec_id")).head.getLong(0)
    val t0 = System.nanoTime()
    operators.Similarity.ensureIvfIndex(spark, work)
    val ivfWall = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    operators.Similarity.ensureKnnGraphIndex(spark, work, k)
    val buildWall = (System.nanoTime() - t1) / 1e9

    // 4 concentrated drift clouds, appended through the IVF ingest
    // path (the graph deliberately LAGS — a refresh-forced rebuild
    // subsumes any lag fold)
    val clouds = 4
    // cell-scale cloud sizing (rule 38): nlist ~ n/centroidMod(n) —
    // the documented sqrt sizing re-derived (mod = max(53,
    // n/ceil(sqrt n))) — and 24x the mean occupancy clears the
    // 16x-MEDIAN trigger at every rung without being a corpus
    // fraction
    val mod = math.max(53L,
      n / math.max(1L, math.ceil(math.sqrt(n.toDouble)).toLong))
    // mean occupancy = n/nlist = centroidMod(n) itself
    val cloudRows = math.min(n / 8, 24L * mod)
    // each cloud is MATERIALIZED once and the same frame reused for
    // the append, the row count, and the merged brute-truth corpus:
    // the unordered .limit() is not guaranteed stable across
    // re-evaluations, so a twice-evaluated cloud could put vectors in
    // the truth set that were never appended to the index (deflating
    // tau-recall) or vice versa (r19 advice)
    val cloud = (0 until clouds).map { i =>
      emb
        .filter(operators.Similarity.hashPick(
          col("vec_id"), s"#gds$i", math.max(2L, n / cloudRows)))
        .limit(cloudRows.toInt)
        .select((col("vec_id") + lit((maxVec + 1) * (7001L + i)))
            .as("vec_id"),
          transform(col("embedding"), (x, j) =>
            (x * lit(0.2f) +
              when(j === i + 1, lit(1.0f)).otherwise(lit(0.0f)))
              .cast("float")).as("embedding"))
        .localCheckpoint()
    }
    val t2 = System.nanoTime()
    val driftRows = (0 until clouds).map { i =>
      val b = cloud(i)
      require(operators.Similarity.appendToIvfIndex(
        spark, work, b, s"gdrift_$i"), s"drift append $i did not apply")
      b.count()
    }.sum
    val appendWall = (System.nanoTime() - t2) / 1e9

    // the POLICY must flag the drifted index unprompted, refresh it,
    // and settle (the DriftGate discipline, replayed on the combined
    // cycle)
    val dry = operators.Similarity.maintainIvfIndex(spark, work,
      dryRun = true)
    val flagged = dry.action == "refresh"
    val t3 = System.nanoTime()
    val maint = operators.Similarity.maintainIvfIndex(spark, work)
    val refreshWall = (System.nanoTime() - t3) / 1e9
    val refreshed = maint.action == "refresh" && maint.ran
    val settled =
      operators.Similarity.maintainIvfIndex(spark, work).action == "none"

    // the refresh changed the quantizer fingerprint — the next graph
    // ensure must REBUILD (never fold) over the merged corpus
    val t4 = System.nanoTime()
    operators.Similarity.ensureKnnGraphIndex(spark, work, k)
    val rebuildWall = (System.nanoTime() - t4) / 1e9
    val (rbChunks, rbRows, rbInnerWall) =
      operators.Similarity.LastGraphBuild
    val rebuilt = rbRows >= n + driftRows

    val merged = emb.select("vec_id", "embedding").unionByName(
      cloud.reduce(_ unionByName _))
    val every = math.max(1L, (n + driftRows) / 200)
    val (mean, tauRecall, tauPairs, probes, _) =
      GraphRecall.measure(spark, work, k, merged, every)

    def r2(x: Double) = math.rint(x * 100) / 100
    println(s"""{"metric":"graph_drift_smoke","src":"$src","n":$n,""" +
      s""""k":$k,"drift_rows":$driftRows,""" +
      s""""np":${operators.Similarity.knngNprobe(n)},""" +
      s""""ivf_build_s":${r2(ivfWall)},"graph_build_s":${r2(buildWall)},""" +
      s""""drift_append_s":${r2(appendWall)},""" +
      s""""policy_flagged":$flagged,"refresh_s":${r2(refreshWall)},""" +
      s""""policy_settled":$settled,""" +
      s""""graph_rebuild_s":${r2(rebuildWall)},""" +
      s""""rebuild_chunks":$rbChunks,"rebuild_rows":$rbRows,""" +
      s""""rebuild_inner_s":${r2(rbInnerWall)},""" +
      s""""recall":${math.rint(mean * 1000) / 1000},""" +
      s""""tau_pairs":$tauPairs,"probes":$probes,""" +
      s""""tau_recall":${math.rint(tauRecall * 1000) / 1000},""" +
      s""""floor":$floor}""")
    var bad = List.empty[String]
    if (!flagged) bad ::= "maintenance policy failed to flag the drift"
    if (!refreshed) bad ::= "maintenance policy did not refresh"
    if (!settled) bad ::= "policy not settled after its own refresh"
    if (!rebuilt) bad ::= s"graph ensure did not rebuild over the " +
      s"merged corpus (built $rbRows of ${n + driftRows} rows)"
    if (floor > 0) {
      require(tauPairs > 0, "no brute edges at tau — broken replica?")
      if (tauRecall < floor)
        bad ::= s"tau-recall $tauRecall below floor $floor"
    }
    spark.stop()
    if (bad.nonEmpty) {
      bad.foreach(m => Console.err.println(s"GRAPH DRIFT SMOKE: $m"))
      sys.exit(1)
    }
  }
}
