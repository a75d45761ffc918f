package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Refinement-decay curve under incremental folds — the r20
  * contract's one open empirical question: folds keep EXACT top-k
  * algebra (per-rank dominance, law-tested) but skip the NN-descent
  * pass, so a fold-grown graph's recall sits somewhere between the
  * ring-only and the freshly-refined levels, drifting as batches
  * accumulate. This main measures exactly that at a real rung:
  * cold refined build → N fresh-id corpus-slice batches folded via
  * appendToKnnGraphIndex, merged-corpus tau-recall measured AFTER
  * EACH fold (brute truth re-derived per step — the corpus grows) →
  * one refineKnnGraphIndex pass → final tau-recall. The curve picks
  * [[operators.Maintenance.DefaultRefineAfter]]: the cadence fires
  * just before the measured decay erodes the ladder floor's margin.
  *
  * Usage: runMain graft.GraphFoldDecayProbe <replicaDir> [k]
  *        [batches] [batchVecs]
  * Prints one JSON line (report-only — the law gates live in
  * SimilaritySpec; this is a measurement harness).
  */
object GraphFoldDecayProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: GraphFoldDecayProbe <replicaDir> [k] [batches] [batchVecs]")
    val src = args(0)
    val k = if (args.length > 1) args(1).toInt else 3
    val nBatches = if (args.length > 2) args(2).toInt else 8
    val batchVecs = if (args.length > 3) args(3).toInt else 2000
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

    // fresh work dir: the folds mutate the dir's persisted indexes,
    // and the ladder replica must stay reusable
    val work = s"/tmp/graft_fold_decay_${new java.io.File(src).getName}"
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
    require(n >= nBatches.toLong * batchVecs,
      s"corpus too small for $nBatches x $batchVecs fold batches")
    val t0 = System.nanoTime()
    operators.Similarity.ensureIvfIndex(spark, work)
    operators.Similarity.ensureKnnGraphIndex(spark, work, k)
    val buildWall = (System.nanoTime() - t0) / 1e9

    // batch i = corpus rows [i*batchVecs, (i+1)*batchVecs) re-id'd
    // fresh (the GraphStreamSmoke stripe idiom: consecutive id slices
    // of a replica span many directions — the production-mixed shape)
    def batchDf(i: Int) = emb
      .filter(col("vec_id") >= i.toLong * batchVecs &&
        col("vec_id") < (i.toLong + 1) * batchVecs)
      .select((col("vec_id") + lit((maxVec + 1) * (6001L + i)))
        .as("vec_id"), col("embedding"))
      .localCheckpoint()

    val tau = 0.35
    def tauOf(merged: org.apache.spark.sql.DataFrame,
              rows: Long): Double = {
      val every = math.max(1L, rows / 200)
      GraphRecall.measure(spark, work, k, merged, every, tau)._2
    }
    val fresh = tauOf(emb.select("vec_id", "embedding"), n)

    var merged = emb.select("vec_id", "embedding")
    var rows = n
    val steps = (0 until nBatches).map { i =>
      val b = batchDf(i)
      val ft0 = System.nanoTime()
      require(operators.Similarity.appendToKnnGraphIndex(
        spark, work, k, b, s"fd_$i"), s"fold $i did not apply")
      val foldWall = (System.nanoTime() - ft0) / 1e9
      merged = merged.unionByName(b.select("vec_id", "embedding"))
      rows += batchVecs
      (tauOf(merged, rows), foldWall)
    }
    val rt0 = System.nanoTime()
    require(operators.Similarity.refineKnnGraphIndex(spark, work, k),
      "re-refine reported nothing unrefined after the folds")
    val refineWall = (System.nanoTime() - rt0) / 1e9
    val restored = tauOf(merged, rows)

    def r3(x: Double) = math.rint(x * 1000) / 1000
    def r2(x: Double) = math.rint(x * 100) / 100
    println(s"""{"metric":"graph_fold_decay","src":"$src","n":$n,""" +
      s""""k":$k,"batches":$nBatches,"batch_vecs":$batchVecs,""" +
      s""""np":${operators.Similarity.knngNprobe(n)},""" +
      s""""refine_rounds":${operators.Similarity.knngRefineRounds},""" +
      s""""build_s":${r2(buildWall)},""" +
      s""""fresh_tau_recall":${r3(fresh)},""" +
      s""""tau_after_each_fold":[${steps.map(s => r3(s._1))
        .mkString(",")}],""" +
      s""""fold_walls_s":[${steps.map(s => r2(s._2)).mkString(",")}],""" +
      s""""rerefine_s":${r2(refineWall)},""" +
      s""""tau_after_rerefine":${r3(restored)}}""")
    spark.stop()
  }
}
