package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Drive [[streaming.CorpusStreams.graphIngestStream]] against a
  * ScaleSmoke-replicated corpus — the r18 verdict's ask #2: the
  * streaming twin was law-tested at fixture scale only, and the batch
  * fold measured via [[FoldProbe]], but no STREAM had run at a real
  * rung. This main copies the replica's embeddings into a fresh work
  * dir (the stream appends to the dir's persisted indexes — the
  * ladder artifacts must stay reusable), pays the cold IVF + graph
  * build, then streams `batches` micro-batches of `batchVecs`
  * fresh-id corpus vectors through the real
  * foreachBatch/checkpointed-source path, with the compact and
  * maintain cadences exercised mid-stream. Reports the per-batch fold
  * wall CURVE (the AppendSmoke discipline: per-append cost must not
  * scale with the index — rule 21), the cadence batches' walls
  * separately, and closes with the merged-corpus tau-recall through
  * [[GraphRecall.measure]] (brute truth over corpus + streamed
  * arrivals, so a correctly ranked streamed near-dup is a hit, not a
  * penalty).
  *
  * Drift leg (r20, the in-stream repair ask): `driftAt >= 0` makes
  * batch `driftAt` a CONCENTRATED drift cloud (the GraphDriftSmoke
  * shape — 0.2-shrunk unit-axis-offset corpus vectors, sized to
  * cell scale: min(n/8, 24x mean occupancy), past the 16x-median
  * hot-cell trigger) instead of a corpus slice. The repair fires in
  * the DELIVERING batch's own fold:
  * [[graft.operators.Similarity.appendToKnnGraphIndex]]'s
  * ingest-side block-guard pre-check (the r20 twin of the r18 fold
  * kernel guard — this smoke's first run is what exposed the gap:
  * the guard raised inside the drift batch's fold BEFORE any
  * maintenance cadence could see the symptom, killing the stream)
  * detects the batch's hot cell, refreshes the quantizer, and the
  * ensure REBUILDS the graph over everything ingested — all inside
  * batch driftAt's wall in fold_walls_s. The smoke asserts the
  * rebuild really ran in-stream (LastGraphBuild covers more than
  * the base corpus) and the policy settled; the later maintain
  * cadences then read healthy.
  *
  * Usage: runMain graft.GraphStreamSmoke <replicaDir> [k] [batches]
  *        [batchVecs] [cadence] [floor] [driftAt]
  * `cadence` drives BOTH compactEvery and maintainEvery (0 = off).
  * Prints one JSON line; exits 1 when tau-recall sits below `floor`
  * (report-only at floor <= 0) or a requested drift leg fails.
  */
object GraphStreamSmoke {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GraphStreamSmoke <replicaDir> [k] " +
      "[batches] [batchVecs] [cadence] [floor]")
    val src = args(0)
    val k = if (args.length > 1) args(1).toInt else 3
    val nBatches = if (args.length > 2) args(2).toInt else 8
    val batchVecs = if (args.length > 3) args(3).toInt else 2000
    val cadence = if (args.length > 4) args(4).toInt else 4
    val floor = if (args.length > 5) args(5).toDouble else -1.0
    val driftAt = if (args.length > 6) args(6).toInt else -1
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
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext

    // fresh work dir beside /tmp: the stream MUTATES the dir's
    // indexes, and the ladder replica must stay reusable
    val work = s"/tmp/graft_graph_stream_${new java.io.File(src).getName}"
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

    // batch i = corpus rows [i*batchVecs, (i+1)*batchVecs) re-id'd to
    // the FoldProbe fresh-id stripe region (disjointness guard holds;
    // consecutive id slices of a replica span many directions, the
    // production-mixed shape)
    def batchRows(i: Int): Seq[streaming.CorpusStreams.Vec] =
      emb.filter(col("vec_id") >= i.toLong * batchVecs &&
          col("vec_id") < (i.toLong + 1) * batchVecs)
        .select((col("vec_id") + lit((maxVec + 1) * (9001L + i)))
          .as("vec_id"), col("embedding"))
        .as[streaming.CorpusStreams.Vec].collect().toSeq
    // the drift batch: one concentrated cloud at cell scale (rule 38
    // sizing; the GraphDriftSmoke shape). Collected ONCE into the
    // precomputed batch list — the unordered limit is not stable
    // across re-evaluations (the r19 DriftSmoke advice)
    val mod = math.max(53L,
      n / math.max(1L, math.ceil(math.sqrt(n.toDouble)).toLong))
    def driftRowsOf(i: Int): Seq[streaming.CorpusStreams.Vec] = {
      val cloudRows = math.min(n / 8, 24L * mod)
      emb.filter(operators.Similarity.hashPick(
          col("vec_id"), s"#gss$i", math.max(2L, n / cloudRows)))
        .limit(cloudRows.toInt)
        .select((col("vec_id") + lit((maxVec + 1) * (8501L + i)))
            .as("vec_id"),
          transform(col("embedding"), (x, j) =>
            (x * lit(0.2f) +
              when(j === 1, lit(1.0f)).otherwise(lit(0.0f)))
              .cast("float")).as("embedding"))
        .as[streaming.CorpusStreams.Vec].collect().toSeq
    }
    require(n >= nBatches.toLong * batchVecs,
      s"corpus too small for $nBatches x $batchVecs stream batches")
    val allBatches = (0 until nBatches).map(i =>
      if (i == driftAt) driftRowsOf(i) else batchRows(i))

    val sunk = scala.collection.mutable.Map.empty[Long, Long]
    val input = MemoryStream[streaming.CorpusStreams.Vec]
    val q = streaming.CorpusStreams.graphIngestStream(
      input.toDS(), work, k, streamId = "gsmoke",
      compactEvery = cadence, maintainEvery = cadence) {
      (df, id) => sunk(id) = df.count()
    }.start()
    val walls = try {
      (0 until nBatches).map { i =>
        val bt = System.nanoTime()
        input.addData(allBatches(i))
        q.processAllAvailable()
        (System.nanoTime() - bt) / 1e9
      }
    } finally q.stop()

    // every batch's sink saw its own adjacency (emission-after-fold)
    require((0 until nBatches).forall(i => sunk.get(i.toLong).exists(_ > 0)),
      s"a stream batch emitted no adjacency: $sunk")

    // drift leg: the in-stream repair must have LEFT NOTHING for an
    // outside observer — the policy settled (no refresh pending) and
    // the graph rebuild over the refreshed quantizer happened inside
    // the stream (LastGraphBuild — JVM-global, written by the
    // in-stream rebuild — covers the full merged corpus)
    val streamedRows = allBatches.map(_.size.toLong).sum
    val (rbChunks, rbRows, rbWall) = operators.Similarity.LastGraphBuild
    val driftSettled = driftAt < 0 ||
      operators.Similarity.maintainIvfIndex(spark, work, dryRun = true)
        .action == "none"
    // the rebuild fires at the first maintain cadence AFTER the
    // drift batch, so it covers the base corpus + everything
    // streamed up to that point — strictly more than the base
    val driftRebuilt = driftAt < 0 || rbRows > n

    // merged truth: corpus + everything streamed (re-read through the
    // root session; the folds ran in cloned micro-batch sessions)
    val streamed = allBatches.flatten
      .toDF("vec_id", "embedding")
    val merged = emb.select("vec_id", "embedding").unionByName(streamed)
    val every = math.max(1L, (n + streamedRows) / 200)
    val (mean, tauRecall, tauPairs, probes, _) =
      GraphRecall.measure(spark, work, k, merged, every)

    val plain = walls.zipWithIndex.filter { case (_, i) =>
      cadence == 0 || (i + 1) % cadence != 0 }.map(_._1)
    val cad = walls.zipWithIndex.filter { case (_, i) =>
      cadence > 0 && (i + 1) % cadence == 0 }.map(_._1)
    def r2(x: Double) = math.rint(x * 100) / 100
    println(s"""{"metric":"graph_stream_smoke","src":"$src","n":$n,""" +
      s""""k":$k,"batches":$nBatches,"batch_vecs":$batchVecs,""" +
      s""""cadence":$cadence,"np":${operators.Similarity.knngNprobe(n)},""" +
      s""""ivf_build_s":${r2(ivfWall)},"graph_build_s":${r2(buildWall)},""" +
      s""""fold_walls_s":[${walls.map(r2).mkString(",")}],""" +
      s""""plain_fold_median_s":${r2(median(plain))},""" +
      s""""cadence_fold_median_s":${if (cad.isEmpty) -1 else r2(median(cad))},""" +
      s""""recall":${math.rint(mean * 1000) / 1000},""" +
      s""""tau_pairs":$tauPairs,"probes":$probes,""" +
      s""""tau_recall":${math.rint(tauRecall * 1000) / 1000},""" +
      s""""drift_at":$driftAt,"drift_settled":$driftSettled,""" +
      s""""drift_rebuilt_in_stream":$driftRebuilt,""" +
      s""""rebuild_rows":$rbRows,"rebuild_chunks":$rbChunks,""" +
      s""""rebuild_inner_s":${r2(rbWall)},""" +
      s""""floor":$floor}""")
    var bad = List.empty[String]
    if (!driftSettled)
      bad ::= "drift leg: IVF policy did not settle in-stream"
    if (!driftRebuilt)
      bad ::= "drift leg: no in-stream graph rebuild over the " +
        s"refreshed quantizer (LastGraphBuild rows $rbRows <= base $n)"
    if (floor > 0) {
      require(tauPairs > 0, "no brute edges at tau — broken replica?")
      if (tauRecall < floor)
        bad ::= s"STREAMED GRAPH TAU-RECALL $tauRecall below floor $floor"
    }
    spark.stop()
    if (bad.nonEmpty) {
      bad.foreach(m => Console.err.println(s"GRAPH STREAM SMOKE: $m"))
      sys.exit(1)
    }
  }

  private def median(xs: Seq[Double]): Double =
    if (xs.isEmpty) -1.0
    else xs.sorted.apply(xs.size / 2)
}
