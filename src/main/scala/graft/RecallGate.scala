package graft

import org.apache.spark.sql.SparkSession

/** ANN result-quality gate at replicated scale.
  *
  * The ANN operators (`q_ann_lsh`, `q_ann_ivf`) are oracle-exempt by
  * design (hash/sample specific), so the sf0.01 differential gate never
  * checks their OUTPUT — and the unit-scale SimilaritySpec recall laws
  * run on ~500 vectors, where the lshBits(n) / sqrt(n)-nlist scaling
  * logic never leaves its floors. This main replays the three
  * registered queries (brute force + both ANN variants) against a
  * ScaleSmoke-replicated corpus — the k-times decorrelated embedding
  * set where bits/nlist actually move — and asserts mean top-5 recall
  * against the same floors the unit laws pin. A recall collapse at
  * scale (bucket occupancy drifting, nprobe not tracking nlist) fails
  * the gate loudly instead of shipping as a silently-worse index.
  *
  * Usage: runMain graft.RecallGate <corpusDir> [lshFloor] [ivfFloor]
  * Prints one JSON line; exits 1 below floor. Wired into
  * tools/scale_gate.sh after the 32x correctness phase.
  */
object RecallGate {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RecallGate <corpusDir> [lshFloor] [ivfFloor]")
    val dir = args(0)
    // floors match SimilaritySpec's unit-scale laws: the scaling claim
    // is that recall holds STEADY as n grows, so the bar does not drop
    val lshFloor = if (args.length > 1) args(1).toDouble else 0.25
    val ivfFloor = if (args.length > 2) args(2).toDouble else 0.5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def topk(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, dir)
        .select("qid", "nid").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet
        }

    val n = Tables.embeddings(spark, dir).count()
    val brute = topk("q_knn_cosine")
    require(brute.size == 10 && brute.values.forall(_.size == 5),
      s"brute-force baseline malformed: ${brute.size} probes")
    def meanRecall(name: String): Double = {
      val ann = topk(name)
      val rs = brute.map { case (q, bf) =>
        (bf & ann.getOrElse(q, Set.empty)).size.toDouble / bf.size
      }
      rs.sum / rs.size
    }
    val lsh = meanRecall("q_ann_lsh")
    val ivf = meanRecall("q_ann_ivf")
    println(f"""{"metric":"recall_gate","dir":"$dir","n":$n,"lsh_recall":$lsh%.3f,"ivf_recall":$ivf%.3f,"lsh_floor":$lshFloor,"ivf_floor":$ivfFloor}""")
    spark.stop()
    if (lsh < lshFloor || ivf < ivfFloor) {
      System.err.println(
        f"RECALL GATE FAILED: lsh $lsh%.3f (floor $lshFloor) / " +
          f"ivf $ivf%.3f (floor $ivfFloor) at n=$n")
      sys.exit(1)
    }
  }
}
