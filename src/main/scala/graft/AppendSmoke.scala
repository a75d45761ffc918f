package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the incremental-index amortization claim:
  * "append cost tracks the BATCH, never the corpus". Times, on one
  * (replicated) corpus dir:
  *
  *  - shingle index: cold build (drop + ensure) vs appending a
  *    synthetic batch of `batchDocs` documents (fresh doc_ids, texts
  *    sampled from the corpus so the shingle distribution is
  *    realistic), plus the probe-equality sanity that the appended
  *    docs are actually findable;
  *  - IVF index: cold build vs appending `batchVecs` synthetic
  *    vectors (fresh vec_ids, embeddings sampled from the corpus).
  *
  * Prints ONE JSON line. The claim holds when append_s is a small
  * fraction of build_s and, across corpus rungs, append_s stays flat
  * while build_s scales with n (SURVEY §18 records the rung points).
  *
  * Usage: runMain graft.AppendSmoke <corpusDir> [batchDocs] [batchVecs]
  */
object AppendSmoke {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: AppendSmoke <corpusDir> [batchDocs] [batchVecs]")
    val dir = args(0)
    val batchDocs = args.lift(1).map(_.toInt).getOrElse(5000)
    val batchVecs = args.lift(2).map(_.toInt).getOrElse(5000)
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
    // synthetic arrivals: corpus-sampled texts under fresh ids
    val batch = docs.limit(batchDocs)
      .select((col("doc_id") + lit(maxDoc + 1)).as("doc_id"), col("text"))
      .localCheckpoint()
    operators.Dedup.dropShingleIndex(spark, dir)
    val (_, buildS) = timed(operators.Dedup.ensureShingleIndex(spark, dir))
    val (applied, appendS) = timed(
      operators.Dedup.appendToShingleIndex(spark, dir, batch, "smoke1"))
    require(applied, "append did not apply")
    // replay must no-op (and cost ~nothing)
    val (replay, replayS) = timed(
      operators.Dedup.appendToShingleIndex(spark, dir, batch, "smoke1"))
    require(!replay, "replayed append applied twice")

    // ---- IVF index ----
    val emb = Tables.embeddings(spark, dir)
    val nVecs = emb.count()
    val maxVec = emb.agg(max("vec_id")).head.getLong(0)
    val vbatch = emb.limit(batchVecs)
      .select((col("vec_id") + lit(maxVec + 1)).as("vec_id"),
        col("embedding"))
      .localCheckpoint()
    operators.Similarity.dropIvfIndex(spark, dir)
    val (_, ivfBuildS) = timed(operators.Similarity.ensureIvfIndex(spark, dir))
    val (vApplied, ivfAppendS) = timed(
      operators.Similarity.appendToIvfIndex(spark, dir, vbatch, "smoke1"))
    require(vApplied, "IVF append did not apply")

    println(f"""{"metric":"append_smoke","dir":"$dir","docs":$nDocs,"batch_docs":$batchDocs,"shingle_build_s":$buildS%.2f,"shingle_append_s":$appendS%.2f,"replay_s":$replayS%.3f,"vecs":$nVecs,"batch_vecs":$batchVecs,"ivf_build_s":$ivfBuildS%.2f,"ivf_append_s":$ivfAppendS%.2f}""")
    // leave the dir's indexes CLEAN: a later gate on the same replica
    // (scale_gate, RecallGate) expects index == corpus slice, and an
    // index carrying these synthetic appends would fail its oracle
    operators.Dedup.dropShingleIndex(spark, dir)
    operators.Similarity.dropIvfIndex(spark, dir)
    spark.stop()
  }
}
