package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness for the incremental-index amortization claim:
  * "append cost tracks the BATCH, never the corpus — and probe cost
  * tracks the CORPUS, never the append count". Times, on one
  * (replicated) corpus dir:
  *
  *  - shingle index: cold build (drop + ensure) vs appending
  *    `nAppends` synthetic batches of `batchDocs` documents each
  *    (fresh doc_ids, texts sampled from the corpus so the shingle
  *    distribution is realistic);
  *  - the PROBE-COST CURVE: a fixed probe batch timed against the
  *    fresh index, against the index after all appends (N extra files
  *    per bucket + unfolded df partials), and again after
  *    compactShingleIndex folds the layout — the many-append tax and
  *    whether compaction repays it;
  *  - IVF index: the same build / N-append / probe / compact cycle.
  *
  * Prints ONE JSON line. The claims hold when append_s stays flat in
  * the batch across appends AND probe_compacted_s returns to ~
  * probe_fresh_s (SURVEY §19 records the rung points).
  *
  * Usage: runMain graft.AppendSmoke <corpusDir> [batchDocs] [batchVecs] [nAppends]
  */
object AppendSmoke {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: AppendSmoke <corpusDir> [batchDocs] [batchVecs] [nAppends]")
    val dir = args(0)
    val batchDocs = args.lift(1).map(_.toInt).getOrElse(5000)
    val batchVecs = args.lift(2).map(_.toInt).getOrElse(5000)
    val nAppends = args.lift(3).map(_.toInt).getOrElse(1)
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

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // ---- shingle index ----
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    val maxDoc = docs.agg(max("doc_id")).head.getLong(0)
    // synthetic arrivals: corpus-sampled texts under fresh ids; batch
    // k uses the k-th id stripe so every batch is disjoint from the
    // corpus, every other batch, and the probe stripe
    def stripe(k: Int, limit: Int): DataFrame = docs.limit(limit)
      .select((col("doc_id") + lit((maxDoc + 1) * k.toLong)).as("doc_id"),
        col("text"))
      .localCheckpoint()
    val probeBatch = stripe(nAppends + 2, batchDocs)
    def probeS(): Double = timed {
      val (f, sh) = operators.Dedup.deltaDedupOf(spark, dir, probeBatch)
      val n = f.count()
      sh.unpersist(blocking = false)
      n
    }._2
    operators.Dedup.dropShingleIndex(spark, dir)
    val (_, buildS) = timed(operators.Dedup.ensureShingleIndex(spark, dir))
    val probeFreshS = probeS()
    val appendTimes = (1 to nAppends).map { k =>
      val b = stripe(k, batchDocs)
      val (applied, t) = timed(
        operators.Dedup.appendToShingleIndex(spark, dir, b, s"smoke$k"))
      require(applied, s"append $k did not apply")
      t
    }
    // replay must no-op (and cost ~nothing)
    val (replay, replayS) = timed(operators.Dedup.appendToShingleIndex(
      spark, dir, stripe(1, batchDocs), "smoke1"))
    require(!replay, "replayed append applied twice")
    val probeAppendedS = probeS()
    val (folded, compactS) =
      timed(operators.Dedup.compactShingleIndex(spark, dir))
    require(folded, "compaction had nothing to fold")
    val probeCompactS = probeS()

    // ---- IVF index ----
    val emb = Tables.embeddings(spark, dir)
    val nVecs = emb.count()
    val maxVec = emb.agg(max("vec_id")).head.getLong(0)
    def vstripe(k: Int): DataFrame = emb.limit(batchVecs)
      .select((col("vec_id") + lit((maxVec + 1) * k.toLong)).as("vec_id"),
        col("embedding"))
      .localCheckpoint()
    val vprobe = vstripe(nAppends + 2)
    def vprobeS(): Double = timed(
      operators.Similarity.ivfProbe(spark, dir, vprobe, 5).count())._2
    operators.Similarity.dropIvfIndex(spark, dir)
    val (_, ivfBuildS) = timed(operators.Similarity.ensureIvfIndex(spark, dir))
    val ivfProbeFreshS = vprobeS()
    val ivfAppendTimes = (1 to nAppends).map { k =>
      val (applied, t) = timed(operators.Similarity.appendToIvfIndex(
        spark, dir, vstripe(k), s"smoke$k"))
      require(applied, s"IVF append $k did not apply")
      t
    }
    val ivfProbeAppendedS = vprobeS()
    val (vFolded, ivfCompactS) =
      timed(operators.Similarity.compactIvfIndex(spark, dir))
    require(vFolded, "IVF compaction had nothing to fold")
    val ivfProbeCompactS = vprobeS()

    // ---- lexical index ----
    // probe = the fixed BM25 query; its scan is bucket-pruned to the
    // query terms, so what this curve shows is the append-layout tax
    // on a SMALL read (N extra files in the probed buckets) plus the
    // per-generation 1-row stats re-aggregation
    def lprobeS(): Double = timed(
      operators.Retrieval.bm25IndexedScores(spark, dir,
        operators.Retrieval.QueryTerms).count())._2
    operators.Retrieval.dropLexIndex(spark, dir)
    val (_, lexBuildS) = timed(operators.Retrieval.ensureLexIndex(spark, dir))
    val lexProbeFreshS = lprobeS()
    val lexAppendTimes = (1 to nAppends).map { k =>
      val b = stripe(k, batchDocs)
      val (applied, t) = timed(
        operators.Retrieval.appendToLexIndex(spark, dir, b, s"smoke$k"))
      require(applied, s"lex append $k did not apply")
      t
    }
    val (lexReplay, lexReplayS) = timed(operators.Retrieval
      .appendToLexIndex(spark, dir, stripe(1, batchDocs), "smoke1"))
    require(!lexReplay, "replayed lex append applied twice")
    val lexProbeAppendedS = lprobeS()
    val (lexFolded, lexCompactS) =
      timed(operators.Retrieval.compactLexIndex(spark, dir))
    require(lexFolded, "lex compaction had nothing to fold")
    val lexProbeCompactS = lprobeS()

    // ---- kNN graph index ----
    // probe = the resolved family read (what graphRank/graphClusters
    // pay before their own math); the per-append curve is the
    // generation-resolve + extra-file tax on the bucketed edge scan.
    // Graph appends fold BOTH indexes (the IVF fold runs inside), so
    // graph_append_s is the full graph-aware ingest cost per batch —
    // compare against ivf_append_s for the graph fold's own share.
    def gprobeS(): Double = timed(
      operators.Similarity.graphEdges(spark, dir, 3).count())._2
    operators.Similarity.dropKnnGraphIndex(spark, dir, 3)
    operators.Similarity.dropIvfIndex(spark, dir)
    timed(operators.Similarity.ensureIvfIndex(spark, dir))
    val (_, graphBuildS) =
      timed(operators.Similarity.ensureKnnGraphIndex(spark, dir, 3))
    val graphProbeFreshS = gprobeS()
    val graphAppendTimes = (1 to nAppends).map { k =>
      val (applied, t) = timed(operators.Similarity.appendToKnnGraphIndex(
        spark, dir, 3, vstripe(k), s"smoke$k"))
      require(applied, s"graph append $k did not apply")
      t
    }
    val (gReplay, gReplayS) = timed(operators.Similarity
      .appendToKnnGraphIndex(spark, dir, 3, vstripe(1), "smoke1"))
    require(!gReplay, "replayed graph append applied twice")
    val graphProbeAppendedS = gprobeS()
    val (gFolded, graphCompactS) =
      timed(operators.Similarity.compactKnnGraphIndex(spark, dir, 3))
    require(gFolded, "graph compaction had nothing to fold")
    val graphProbeCompactS = gprobeS()

    def arr(ts: Seq[Double]): String =
      ts.map(t => f"$t%.2f").mkString("[", ",", "]")
    println(f"""{"metric":"append_smoke","dir":"$dir","docs":$nDocs,"batch_docs":$batchDocs,"n_appends":$nAppends,"shingle_build_s":$buildS%.2f,"shingle_append_s":${arr(appendTimes)},"replay_s":$replayS%.3f,"probe_fresh_s":$probeFreshS%.2f,"probe_appended_s":$probeAppendedS%.2f,"compact_s":$compactS%.2f,"probe_compacted_s":$probeCompactS%.2f,"vecs":$nVecs,"batch_vecs":$batchVecs,"ivf_build_s":$ivfBuildS%.2f,"ivf_append_s":${arr(ivfAppendTimes)},"ivf_probe_fresh_s":$ivfProbeFreshS%.2f,"ivf_probe_appended_s":$ivfProbeAppendedS%.2f,"ivf_compact_s":$ivfCompactS%.2f,"ivf_probe_compacted_s":$ivfProbeCompactS%.2f,"lex_build_s":$lexBuildS%.2f,"lex_append_s":${arr(lexAppendTimes)},"lex_replay_s":$lexReplayS%.3f,"lex_probe_fresh_s":$lexProbeFreshS%.2f,"lex_probe_appended_s":$lexProbeAppendedS%.2f,"lex_compact_s":$lexCompactS%.2f,"lex_probe_compacted_s":$lexProbeCompactS%.2f,"graph_build_s":$graphBuildS%.2f,"graph_append_s":${arr(graphAppendTimes)},"graph_replay_s":$gReplayS%.3f,"graph_probe_fresh_s":$graphProbeFreshS%.2f,"graph_probe_appended_s":$graphProbeAppendedS%.2f,"graph_compact_s":$graphCompactS%.2f,"graph_probe_compacted_s":$graphProbeCompactS%.2f}""")
    // leave the dir's indexes CLEAN: a later gate on the same replica
    // (scale_gate, RecallGate) expects index == corpus slice, and an
    // index carrying these synthetic appends would fail its oracle
    operators.Dedup.dropShingleIndex(spark, dir)
    operators.Similarity.dropKnnGraphIndex(spark, dir, 3)
    operators.Similarity.dropIvfIndex(spark, dir)
    operators.Retrieval.dropLexIndex(spark, dir)
    spark.stop()
  }
}
