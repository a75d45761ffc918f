package graft

import graft.operators.TextAnalysis

/** The lmNll size gate picks between two join shapes (per-occurrence
  * for short docs, occurrence-aggregated for long ones — see
  * TextAnalysis.lmOccAggregate). The branches must be row-identical:
  * Σ m·term over distinct (doc, bigram) keys equals Σ term over
  * occurrences exactly (both DECIMAL), and n_bigrams = Σ m = count(*).
  * This spec pins that, so the sf0.01 oracle gate (which exercises
  * whichever branch the gate picks) transitively covers both. */
class LmGateSpec extends SparkSuite {

  test("lmNll occurrence-aggregated and per-occurrence branches agree") {
    def rows(occAgg: Boolean): Seq[(Long, Long, Double)] =
      TextAnalysis.lmNll(spark, sf, Some(occAgg))
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val agg = rows(occAgg = true)
    val occ = rows(occAgg = false)
    assert(agg.nonEmpty)
    assert(agg == occ)
  }

  test("size gate picks per-occurrence on the tiny synthetic corpus") {
    // ~120 compressed bytes/doc is far under the 2 KiB threshold; a
    // gate flip here would mean the proxy computation changed
    assert(!TextAnalysis.lmOccAggregate(spark, sf))
  }
}
