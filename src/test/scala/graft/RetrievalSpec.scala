package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** Laws for the retrieval family (the DuckDB oracle is the main gate;
  * these pin the semantics the oracle hash can't explain on failure). */
class RetrievalSpec extends SparkSuite {

  test("bm25 top-10: full, sorted, and idf-dominated by the rare term") {
    val rows = SparkEntry.queries("q_bm25")(spark, sf).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getDouble(1))
    assert(scores.sameElements(scores.sortBy(-_)), "scores sorted desc")
    assert(scores.forall(_ > 0))
    // the rare term's idf dwarfs the common terms': every top-10 doc
    // must actually contain it
    val topIds = rows.map(_.getLong(0)).toSet
    val withRare = Tables.documents(spark, sf)
      .filter(array_contains(split(col("text"), " "), "dup"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(topIds.subsetOf(withRare),
      s"top-10 not all rare-term docs: ${topIds.diff(withRare)}")
  }

  test("bm25 scores only docs containing a query term") {
    val scored = Retrieval.bm25Scores(spark, sf, Retrieval.QueryTerms)
    val hasTerm = Tables.documents(spark, sf)
      .filter(Retrieval.QueryTerms
        .map(t => array_contains(split(col("text"), " "), t))
        .reduce(_ || _))
    assert(scored.count() == hasTerm.count())
  }

  test("rrf fusion: membership, self-consistency, and both-lists bonus") {
    val rows = SparkEntry.queries("q_hybrid_rrf")(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val lr = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val vr = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(lr.isDefined || vr.isDefined, "every fused doc came from a list")
      val expected = lr.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        vr.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - expected) < 1e-6,
        s"rrf self-consistency at doc ${r.getLong(0)}")
    }
    // a doc on both lists beats any single-list doc of equal-or-worse
    // ranks: rank-1 on both is the global maximum
    val best = rows.head
    assert(rows.forall(_.getDouble(3) <= best.getDouble(3) + 1e-12))
  }
}
