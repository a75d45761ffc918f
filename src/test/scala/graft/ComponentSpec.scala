package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame

/** Laws for connectedComponents: the driver-side union-find and the
  * distributed pointer-jumping loop must agree with each other and
  * with hand-computed components on known graphs. */
class ComponentSpec extends SparkSuite {

  private def pairsDf(edges: Seq[(Long, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    edges.toDF("da", "db")
  }

  private def byNode(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // chain 1-2-3-4-5 (diameter > 2: pointer jumping earns its keep),
  // triangle 10-11-12, isolated pair (20,21), cross-edges out of order
  private val graph = Seq[(Long, Long)](
    (2L, 1L), (2L, 3L), (4L, 3L), (5L, 4L),
    (11L, 10L), (12L, 11L), (12L, 10L),
    (21L, 20L))
  private val expected = Map[Long, Long](
    1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
    10L -> 10L, 11L -> 10L, 12L -> 10L,
    20L -> 20L, 21L -> 20L)

  test("local union-find labels components by min id") {
    assert(byNode(Dedup.connectedComponents(pairsDf(graph))) == expected)
  }

  test("distributed pointer-jumping agrees with the local path") {
    val dist = Dedup.connectedComponents(pairsDf(graph), localMaxEdges = 0L)
    assert(byNode(dist) == expected)
  }

  test("empty edge list yields empty labels on both paths") {
    val empty = pairsDf(Seq.empty)
    assert(Dedup.connectedComponents(empty).count() == 0L)
    assert(Dedup.connectedComponents(empty, localMaxEdges = -1L).count() == 0L)
  }

  test("long chain converges within the O(log d) round budget") {
    // path of 200 nodes: one-hop propagation would need ~200 rounds and
    // trip maxIter = 20; pointer jumping must finish inside it
    val chain = (1L until 200L).map(i => (i, i + 1))
    val labels = Dedup.connectedComponents(pairsDf(chain), localMaxEdges = 0L)
    val got = byNode(labels)
    assert(got.size == 200 && got.values.forall(_ == 1L))
  }
}
