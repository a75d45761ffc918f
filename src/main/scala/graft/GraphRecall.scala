package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Global edge recall of the cell-bounded kNN graph (q_knn_graph) at
  * replicated scale.
  *
  * The graph is exact WITHIN each quantizer cell (differentially
  * oracled at sf0.01 and in the 32x scale gate); what the oracle can
  * never measure is the cost of the cell bound itself — true nearest
  * neighbors that live in a DIFFERENT cell are structurally out of
  * scope. This main builds the full graph over a ScaleSmoke-replicated
  * corpus, takes a deterministic ~200-node probe sample, computes the
  * sample's TRUE top-k by brute force (probe-sample × corpus — one
  * broadcast scan, never all-pairs), and reports mean edge recall.
  *
  * Usage: runMain graft.GraphRecall <corpusDir> [floor] [sampleEvery]
  * Prints one JSON line; exits 1 below floor when a floor is given
  * (report-only otherwise).
  */
object GraphRecall {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: GraphRecall <corpusDir> [floor] [sampleEvery]")
    val dir = args(0)
    val floor = if (args.length > 1) Some(args(1).toDouble) else None
    val sampleArg = if (args.length > 2) args(2).toLong else 0L
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

    val k = 3
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val every = if (sampleArg > 0) sampleArg else math.max(1L, n / 200)
    val probes = emb.filter(col("vec_id") % every === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        operators.Similarity.norm(col("embedding")).as("qn"))
    def grouped(rows: Array[org.apache.spark.sql.Row]) =
      rows.groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet
      }
    val brute = grouped(operators.Similarity
      .bruteForceKnn(probes, emb, k).select("qid", "nid").collect())
    val graph = grouped(operators.Similarity.knnGraph(spark, dir, k)
      .filter(col("qid") % every === 0).select("qid", "nid").collect())
    require(brute.nonEmpty, "empty probe sample")
    val recalls = brute.map { case (q, bf) =>
      (bf & graph.getOrElse(q, Set.empty)).size.toDouble / bf.size
    }
    val mean = recalls.sum / recalls.size
    println(s"""{"metric":"graph_recall","n":$n,"k":$k,""" +
      s""""probes":${brute.size},"recall":${math.rint(mean * 1000) / 1000}""" +
      s""","floor":${floor.getOrElse(-1.0)}}""")
    if (floor.exists(mean < _)) {
      System.err.println(s"GRAPH RECALL ${mean} below floor ${floor.get}")
      sys.exit(1)
    }
    spark.stop()
  }
}
