package graft

import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan property regressions: the plan shapes the engine's
  * 100 TB posture depends on (SURVEY.md §10) are asserted, not just
  * dumped by graft.Explain — a change that silently degrades top-k to
  * a total sort, drops a pushed filter, or turns a dim broadcast into
  * a shuffle join fails here long before a benchmark notices.
  *
  * Assertions run on the pre-execution formatted plan (AQE's initial
  * plan): join strategies asserted here are the statically-chosen ones
  * from size estimates, which is exactly the property we want pinned
  * (dims must be broadcastable by ESTIMATE, not only after AQE
  * measures them).
  */
class PlanSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(FormattedMode)

  test("top-k queries plan TakeOrderedAndProject, never a total sort") {
    for (q <- Seq("q_topk", "q_sql_tpch_q3", "q_sql_tpch_q10", "q_sql_tpch_q18"))
      assert(plan(q).contains("TakeOrderedAndProject"),
        s"$q lost its TakeOrderedAndProject")
  }

  test("range predicate reaches the parquet scan as a pushed filter") {
    val p = plan("q_filter_range")
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(l_shipdate") &&
      p.contains("LessThan(l_shipdate"),
      s"shipdate range not pushed:\n${p.take(2000)}")
  }

  test("keys-only projection prunes the scan to one column") {
    val p = plan("q_keys")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("p_partkey") && !read.contains("p_name"),
      s"q_keys scan not pruned to p_partkey: $read")
  }

  test("dimension joins broadcast; the snowflake has no shuffled dim join") {
    for (q <- Seq("q_join_multi", "q_sql_tpch_q5"))
      assert(plan(q).contains("BroadcastHashJoin"),
        s"$q lost its broadcast dim join")
  }

  test("per-group top-k prunes groups with WindowGroupLimit") {
    for (q <- Seq("q_sample_stratified", "q_ann_lsh", "q_knn_cosine"))
      assert(plan(q).contains("WindowGroupLimit"),
        s"$q lost WindowGroupLimit group pruning")
  }

  test("Q18's HAVING subquery decorrelates to a semi-join") {
    assert(plan("q_sql_tpch_q18").contains("LeftSemi"),
      "q_sql_tpch_q18 IN-subquery no longer a semi-join")
  }

  test("rank assignment is a broadcast join, not a 3-partition window") {
    // q_window_rank: rnk/drnk come from the ranked (flag, qty)
    // aggregate broadcast back to the fact — a window would funnel the
    // corpus through |returnflag| = 3 sort tasks
    val p = plan("q_window_rank")
    assert(p.contains("BroadcastHashJoin"),
      "q_window_rank lost its rank-the-aggregate broadcast shape")
    // the ntile leg: the cells frame is pinned (localCheckpoint, r20
    // opt — without it the branch filters pushed into the broadcast
    // side defeat ReuseExchange and the corpus-wide cells aggregate
    // runs TWICE), so both branches broadcast the same materialized
    // RDD and the q_lo/q_hi straddle gate is a plain column
    // (in)equality pushed onto the ~150-row cells side: uniform keeps
    // `q_lo = q_hi`, straddle keeps the complement — only straddling
    // cells' rows ever reach the row_number window
    assert(p.contains("Scan ExistingRDD"),
      "q_window_rank cells frame no longer pinned (localCheckpoint)")
    assert(p.contains(" = q_hi#") && p.contains("NOT (q_lo#"),
      "q_window_rank lost its straddle-gated ntile decomposition")
    // exactly ONE Window survives corpus-side (the straddle slice);
    // the cells aggregate's own window lives inside the pin, and a
    // second Window here would mean the decomposition regressed to a
    // corpus-wide shuffle
    val nWindows = p.linesIterator.count(_.matches("""\(\d+\) Window"""))
    assert(nWindows == 1,
      s"q_window_rank expected exactly 1 Window operator, got $nWindows")
  }

  test("delta dedup probes the stored shingle index tables") {
    // the whole point of q_dedup_delta: corpus postings, df stats and
    // sorted sets come from the persisted index, never re-shingled per
    // batch. The query entry materializes eagerly (only an RDD scan
    // remains to explain), so the unmaterialized builder is asserted.
    val (frame, sh) = graft.operators.Dedup.deltaDedup(spark, sf)
    val p = frame.queryExecution.explainString(FormattedMode)
    assert(p.contains("graft_shidx_post_") &&
      p.contains("graft_shidx_sets_") && p.contains("graft_shidx_df_"),
      "q_dedup_delta no longer reads the persisted shingle index")

    // and the postings side of the candidate join must join on its
    // BUCKET layout, exchange-free: a Union (or any wrapper reporting
    // unknown partitioning) above the scan re-shuffles the whole
    // corpus postings per probe — the round-13 review catch. Find the
    // lowest join whose child subtree holds the postings scan; that
    // child must contain no shuffle exchange.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def hasPostings(pl: SparkPlan): Boolean = pl.collectLeaves().exists {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.exists(
          _.toString.contains("graft_shidx_post_"))
      case _ => false
    }
    def isJoin(pl: SparkPlan): Boolean = pl match {
      case _: org.apache.spark.sql.execution.joins.BaseJoinExec => true
      case _ => false
    }
    val sp = frame.queryExecution.sparkPlan
    sh.unpersist(blocking = true)
    val postingSides = sp.collect {
      case j if isJoin(j) => j.children.filter(c =>
        hasPostings(c) && !c.exists(n => (n ne c) && isJoin(n)))
    }.flatten
    assert(postingSides.nonEmpty, "no join reads the postings scan")
    postingSides.foreach { side =>
      assert(side.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        "postings side re-shuffles — bucket layout forfeited:\n" + side)
    }
  }

  test("ntile large branch is bucket arithmetic, not a global window") {
    // q_window_ntile is size-gated: at test scale the query entry takes
    // the plain-window branch (the whole aggregate fits one sort task),
    // so the 100 TB branch is pinned directly. A Window.orderBy with no
    // partitionBy funnels every customer through ONE sort task; the
    // decomposed form range-partitions the total order and turns
    // ntile/lead into arithmetic over a broadcast per-bucket frame.
    // The corpus-side plan must carry no ntile window function (the
    // only remaining windows run over the <=|buckets| stats frame and
    // the bucket-partitioned row_number/lead).
    // (the range exchange itself sits behind the checkpoint barrier —
    // a LogicalRDD scan in this plan — so the pinnable signatures are
    // the absent ntile window and the broadcast stats join)
    import graft.operators.Relational
    val p = Relational.ntileDecomposed(spark, Relational.ntileAgg(spark, sf))
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("ntile("),
      "q_window_ntile large branch regressed to a true global ntile window")
    assert(p.contains("BroadcastHashJoin"),
      "q_window_ntile large branch lost its broadcast bucket-stats join")
    // the gated entry at test scale must be the PLAIN window (the gate
    // exists to recover the small-corpus cost of the decomposition)
    assert(plan("q_window_ntile").contains("ntile("),
      "q_window_ntile small branch no longer a plain window below the gate")
    // same gate, same machinery for the distribution family
    val pc = Relational.cumeDecomposed(spark, Relational.ntileAgg(spark, sf))
      .queryExecution.explainString(FormattedMode)
    assert(!pc.contains("percent_rank(") && !pc.contains("cume_dist("),
      "q_window_cume large branch regressed to true global windows")
    assert(pc.contains("BroadcastHashJoin"),
      "q_window_cume large branch lost its broadcast bucket-stats join")
  }

  test("decontamination broadcasts the eval side, never shuffles train") {
    // the eval/benchmark set is fixed-size while the train corpus grows
    // without bound: the gram join must be a broadcast of eval (the
    // train side is scanned once) — a sort-merge join here would
    // shuffle the 100 TB side on a string key
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      "q_decontaminate lost its eval-side broadcast")
    assert(!p.contains("SortMergeJoin"),
      "q_decontaminate shuffles the train side")
  }

  test("IVF cell assignment is a fused map-only expression, not a join") {
    // the crossJoin+max_by form materialized n x nlist wide rows —
    // O(n^1.5) with sqrt-sized centroids; 15.65x at the 128x rehearsal.
    // The assignment must stay ONE native expression on the corpus scan
    // (the only nested-loop join left is the tiny probe x centroid one,
    // whose build side is the <=10-row probe frame).
    for (q <- Seq("q_ann_ivf", "q_cluster_assign")) {
      val p = plan(q)
      assert(p.contains("nearest_centroid"),
        s"$q lost its fused NearestCentroid assignment")
      assert(!p.contains("max_by"),
        s"$q regressed to the crossJoin+max_by assignment")
    }
  }

  test("curation pipeline packs by shard-partitioned windows, never global") {
    // the composed DAG's final stage (seq-pack + split over the
    // survivors) must keep q_seq_pack's scale shape: cumsum windows
    // partitioned by shard, split map-only — nothing in the composed
    // plan may collapse to one partition (the presentation sort is a
    // range exchange, which is fine). Upstream stages sit behind the
    // localCheckpoint pins; their shapes are pinned via the standalone
    // twins (decontaminate broadcast above, CurationSpec value
    // equality per stage).
    val p = plan("q_pipeline_curate")
    assert(p.contains("Window"), "pipeline lost its pack window")
    assert(!p.contains("SinglePartition"),
      "pipeline introduced a corpus-global single-partition stage")
  }

  test("session compaction windows stay user-partitioned, never global") {
    // both window passes (slice-local sessionize, cross-slice compact)
    // and the final aggregate key on user_id — at k-times users the
    // plan scales by partition count. The only tolerable
    // SinglePartition would come from the presentation orderBy's range
    // exchange, which is not a SinglePartition node.
    val p = plan("q_session_compact")
    assert(p.contains("Window"), "compaction lost its windows")
    assert(!p.contains("SinglePartition"),
      "session compaction introduced a corpus-global stage")
  }

  test("graph consumers probe the persisted edge table, never rebuild") {
    // the whole point of the kNN graph index: q_knn_graph_delta and
    // the rank/cluster/sample consumers read graft_knng_edges_* — a
    // plan that re-derives the ring (nearest_cells / nearest_centroid
    // in THIS plan) has regressed to the 47-57 s/consumer rebuild.
    // (ensure runs eagerly inside the builders; the remaining plan
    // must be reads + the consumer's own math.)
    for (q <- Seq("q_knn_graph_delta", "q_graph_rank", "q_graph_cluster",
        "q_cluster_sample")) {
      val p = plan(q)
      assert(!p.contains("nearest_cells") && !p.contains("nearest_centroid"),
        s"$q re-derives the ring instead of probing the graph index")
    }
    assert(plan("q_knn_graph_delta").contains("graft_knng_edges_"),
      "q_knn_graph_delta no longer reads the persisted edge table")
  }

  test("knn graph evaluates the nearest_cells ring exactly once per row") {
    // InferFiltersFromGenerate synthesizes Filter(size(g) > 0 AND
    // isnotnull(g)) below a non-outer Generate — with g = the native
    // top-P ring, that re-ran the k-centroid scan per corpus row a
    // second time (the r15 plan-audit finding #1). explode_outer keeps
    // the rule off; this pins the single eval.
    val p = plan("q_knn_graph")
    val evals = "nearest_cells\\(".r.findAllIn(p).size
    assert(evals == 1,
      s"q_knn_graph must evaluate nearest_cells exactly once, found " +
        s"$evals:\n${p.linesIterator.filter(_.contains("nearest_cells"))
          .mkString("\n")}")
  }

  test("semantic dedup assigns cells once, behind a checkpoint barrier") {
    // the first cut invoked the nearestCentroid argmax per role
    // (earlier / later / output) — three corpus scans each paying the
    // k-centroid loop. The single localCheckpoint'd assignment frame
    // leaves ZERO nearest_centroid evals in the consuming plan.
    val p = plan("q_dedup_semantic")
    assert(!p.contains("nearest_centroid"),
      "q_dedup_semantic re-evaluates the centroid argmax above the " +
        "checkpointed assignment frame")
  }

  test("LSH bucketing is map-only: no aggregate before the bucket explode") {
    // the bucket computation must stay a projection (plane literals +
    // posexplode) — the retired shape aggregated sign bits with
    // groupBy(vec_id, table_id), which shuffled corpus x tables rows.
    // No aggregate in the plan may key on table_id (the candidate
    // distinct keys on (qid, nid) and is fine).
    val p = plan("q_ann_lsh")
    assert(!"Keys \\[[^\\]]*table_id".r.findFirstIn(p).isDefined,
      "bucket computation re-introduced a groupBy(vec_id, table_id)")
  }
}
