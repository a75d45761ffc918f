package graft

import graft.operators.{Curation, Dedup, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed curation pipeline must equal running its stages one by
  * one — same operators, same cutoff-over-survivors semantics — and the
  * shared LM frame must carry exactly the stage-2 scores. The DuckDB
  * oracle covers the full chain differentially; this spec pins the
  * COMPOSITION law in-repo so a refactor of curate() cannot silently
  * reorder or re-scope a stage. */
class CurationSpec extends SparkSuite {

  private def ids(df: DataFrame): Seq[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  test("composed pipeline == stage-by-stage application") {
    val sp = spark
    val docs0 = Tables.documents(sp, sf)
      .select(col("doc_id"), col("source"), col("text"))
    val evalDocs = docs0.filter(col("doc_id") % 41 === 0)
    val train0 = docs0.filter(col("doc_id") % 41 =!= 0)

    // stage 1 by hand: quality >= exact 20th percentile of train0
    val scored = train0.withColumn("q", TextAnalysis.qualityExpr)
    val c1 = scored.agg(
      expr("percentile_approx(q, 0.2, 2147483647)")).head.getDouble(0)
    val s1 = scored.filter(col("q") >= c1)
      .select(col("doc_id"), col("source"), col("text"))

    // stage 2 by hand: NLL over s1, keep <= 90th percentile
    val nll = TextAnalysis.lmNllOf(s1, occAgg = false)
    val c2 = nll.agg(
      expr("percentile_approx(avg_nll, 0.9, 2147483647)")).head.getDouble(0)
    val s2 = s1.join(
      nll.filter(col("avg_nll") <= c2).select("doc_id"), Seq("doc_id"))

    // stage 3 by hand: exact-dedup keepers
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(lower(col("text")).cast("binary")))
    val s3 = s2.withColumn("keeper", min("doc_id").over(w))
      .filter(col("doc_id") === col("keeper"))
      .select(col("doc_id"), col("source"), col("text"))

    // stage 4 by hand: drop contaminated vs the UNFILTERED eval suite
    val contam = Dedup.contamination(
      Dedup.gramHashes(s3), Dedup.gramHashes(evalDocs))
      .select(col("train_id").as("doc_id")).distinct()
    val s4 = s3.join(contam, Seq("doc_id"), "left_anti")

    val expectPacked = TextAnalysis.seqPack(s4)
      .withColumn("bucket", TextAnalysis.splitBucket)
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("bin"),
        col("bin_offset"),
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "val")
          .otherwise("test").as("split"))

    val got = Curation.curate(spark, sf)
    assert(ids(got.lmScores) == ids(nll))
    val gotRows = got.packed.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val expRows = expectPacked.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(gotRows.nonEmpty)
    assert(gotRows == expRows)
  }

  test("every stage strictly filters and survivors are a chain") {
    val got = Curation.curate(spark, sf)
    val all = Tables.documents(spark, sf).count()
    val out = got.packed.count()
    assert(out > 0 && out < all)
    // packed survivors are a subset of the scored (stage-2 input) docs
    val scoredIds = ids(got.lmScores).toSet
    assert(ids(got.packed).forall(scoredIds.contains))
  }

  test("doc chunking: full coverage, stride offsets, exact " +
    "reconstruction, and the last window reaches the end") {
    val (w, s) = (32, 24)
    val docs = Tables.documents(spark, sf)
    val toks = docs.collect().map(r =>
      r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    val got = TextAnalysis.docChunks(docs, w, s)
      .collect().groupBy(_.getLong(0)).map { case (id, rs) =>
        id -> rs.sortBy(_.getLong(1)).map(r =>
          (r.getLong(1), r.getString(2), r.getLong(3)))
      }
    assert(got.keySet == toks.keySet, "every doc must emit chunks")
    got.foreach { case (id, chunks) =>
      val t = toks(id)
      // chunk i is exactly tokens [i*s, i*s + w)
      chunks.foreach { case (i, text, n) =>
        val expect = t.slice((i * s).toInt, (i * s).toInt + w)
        assert(text == expect.mkString(" ") && n == expect.length,
          s"doc $id chunk $i diverges")
      }
      // contiguous ids from 0; last window covers the final token
      assert(chunks.map(_._1).toSeq == (0L until chunks.length).toSeq)
      val lastStart = (chunks.last._1 * s).toInt
      assert(lastStart + w >= t.length, s"doc $id tail uncovered")
      // and one fewer chunk would leave a tail uncovered (minimality)
      if (chunks.length > 1)
        assert((chunks(chunks.length - 2)._1 * s).toInt + w < t.length,
          s"doc $id emitted a redundant trailing chunk")
    }
    // fixture strength: multi-chunk docs exist
    assert(got.values.exists(_.length >= 3))
  }

  test("importance weights: target-vocabulary docs outweigh raw-" +
    "vocabulary docs, keep is the exact top-20% cutoff (ties " +
    "included), deterministic") {
    val sp = spark; import sp.implicits._
    // two disjoint vocabularies: the target slice writes alpha..delta,
    // the raw remainder omega..phi; two unlabeled probes carry one
    // pure vocabulary each
    val docs = ((1L to 4L).map(i =>
        (i, "alpha beta gamma delta alpha beta", true)) ++
      (5L to 8L).map(i => (i, "omega psi chi phi omega psi", false)) ++
      Seq((9L, "alpha beta gamma delta", false),
        (10L, "omega psi chi phi", false)))
      .toDF("doc_id", "text", "is_t")
    def run() = Curation.importanceWeightsOf(docs, col("is_t"), 256)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(4)))).toMap
    val got = run()
    // the unlabeled target-vocab probe outweighs the raw-vocab probe
    assert(got(9L)._2 > got(10L)._2)
    // every target-slice doc outweighs every raw-slice doc
    assert((1L to 4L).map(got(_)._2).min > (5L to 8L).map(got(_)._2).max)
    // keep = logw >= the 8th-smallest value (ceil(0.8*10)) — docs 1-4
    // share one text, so the tied cutoff value keeps all FOUR: the
    // rank-based rule keeps ties, it does not truncate to a count
    assert(got.values.count(_._3) == 4)
    assert((1L to 4L).forall(got(_)._3) && !(5L to 10L).exists(got(_)._3))
    // token counts survive the bucket aggregation
    assert(got(9L)._1 == 4L && got(1L)._1 == 6L)
    assert(run() == got, "importance weights must be deterministic")
  }

  test("Cli curate writes the packed artifact + manifest equal to " +
    "running the pipeline directly") {
    val sp = spark
    val out = java.nio.file.Files
      .createTempDirectory("graft_curate_cli").toString
    Cli.run(Array("curate", sf, out), sp)
    val written = sp.read.parquet(s"$out/packed.parquet")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val direct = Curation.curate(sp, sf).packed
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(written == direct,
      s"CLI artifact (${written.size}) != direct pipeline (${direct.size})")
    val man = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "_CURATE_MANIFEST.json"))
    assert(man.contains(s""""docs":${direct.size}"""))
    assert(man.contains(""""train":"""))
    assert(sp.read.parquet(s"$out/lm_scores.parquet").count() > 0)
  }

  test("importance sample: Gumbel-top-k equals the k-prefix of the " +
    "fully keyed order, emits a total (gkey desc, doc_id) order, and " +
    "is deterministic") {
    val sp = spark; import sp.implicits._
    val docs = (1L to 40L).map(i =>
        (i, s"w${i % 7} w${i % 5} w${i % 3} w${i % 11}", i % 4 == 0))
      .toDF("doc_id", "text", "is_t")
    val full = Curation.importanceSampleOf(docs, col("is_t"), 40, 64)
      .collect()
    val top = Curation.importanceSampleOf(docs, col("is_t"), 10, 64)
      .collect()
    assert(full.length == 40 && top.length == 10)
    // the k-sample IS the k-prefix of the full keyed order (limit
    // cannot reorder or swap members)
    assert(top.map(_.getLong(0)).toSeq ==
      full.take(10).map(_.getLong(0)).toSeq)
    // total order: keys non-increasing, ties broken by ascending id
    val keys = full.map(r => (r.getDouble(3), r.getLong(0))).toSeq
    assert(keys.sliding(2).forall {
      case Seq((a, ai), (b, bi)) => a > b || (a == b && ai < bi)
      case _ => true
    })
    val again = Curation.importanceSampleOf(docs, col("is_t"), 10, 64)
      .collect()
    assert(again.map(_.toSeq).toSeq == top.map(_.toSeq).toSeq,
      "importance sample must be deterministic")
  }
}
