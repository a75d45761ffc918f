package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Laws for the oracle-exempt BPE merge induction: the distributed
  * program must equal an INDEPENDENT driver reference implementing
  * byte-pair encoding the textbook way (word-frequency map, pair
  * counts, lexicographic-tie argmax, leftmost-greedy non-overlapping
  * merge), both over the raw sf fixture and over a hand-built corpus
  * whose merge sequence is verifiable by eye. */
class BpeSpec extends SparkSuite {

  /** Textbook driver BPE over (word -> count). */
  private def referenceBpe(freq: Map[String, Long],
                           k: Int): Seq[(Long, String, String, Long)] = {
    var words: Map[Vector[String], Long] = freq.toSeq
      .map { case (w, c) => (w.split("").toVector :+ "</w>") -> c }
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
    val out = scala.collection.mutable.ListBuffer
      .empty[(Long, String, String, Long)]
    var step = 1
    var more = true
    while (step <= k && more) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => pairs((a, b)) = pairs.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (pairs.isEmpty) more = false
      else {
        val ((l, r), f) = pairs.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }
        out += ((step.toLong, l, r, f))
        words = words.toSeq.map { case (syms, c) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { x =>
            if (merged.nonEmpty && merged.last == l && x == r) {
              merged.remove(merged.length - 1); merged += (l + r)
            } else merged += x
          }
          merged.toVector -> c
        }.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
      }
      step += 1
    }
    out.toSeq
  }

  private def run(df: org.apache.spark.sql.DataFrame, k: Int) =
    TextAnalysis.bpeMerges(df, k).orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq

  test("bpe merges equal the driver reference on the sf fixture") {
    val docs = Tables.documents(spark, sf)
    val freq = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = referenceBpe(freq, 8)
    val got = run(docs, 8)
    assert(expected.size == 8, "fixture too weak: fewer than 8 merges")
    assert(got == expected,
      s"distributed merges diverge from the reference:\n got $got\n exp $expected")
  }

  test("hand corpus: merge order, word-boundary terminal, and the " +
    "greedy non-overlap law") {
    val sp = spark; import sp.implicits._
    // 'aaaa' x3 + 'ab' x2: (a,a) wins first (weight 9 = 3 pairs x 3),
    // then greedy non-overlap leaves exactly one (aa,aa) pair per word
    val docs = Seq((1L, "aaaa aaaa aaaa ab ab")).toDF("doc_id", "text")
    val got = run(docs, 3)
    assert(got(0)._2 == "a" && got(0)._3 == "a" && got(0)._4 == 9L,
      s"first merge should be (a,a)@9: ${got(0)}")
    // greedy non-overlap leaves (aa)(aa)(</w>) per word, so both
    // (aa,aa) and (aa,</w>) count 3 — the lexicographic tie rule picks
    // (aa,</w>) ('<' sorts before 'a'), which is itself a law check
    assert(got(1) == ((2L, "aa", "</w>", 3L)),
      s"tie must break lexicographically to (aa,</w>)@3: ${got(1)}")
    // after merge 2 each aaaa-word is (aa)(aa</w>): the only 3-weight
    // pair left is (aa, aa</w>)
    assert(got(2) == ((3L, "aa", "aa</w>", 3L)),
      s"(aa,aa</w>)@3 must follow: ${got(2)}")
    // </w> keeps merges word-bounded: no rule may span the terminal
    // as a LEFT symbol (nothing follows it inside a word)
    assert(got.forall(r => !r._2.endsWith("</w>") || r._2 == "</w>"),
      s"a merge consumed a terminal as its left symbol: $got")
  }

  test("a frequent single-char word fully merges without poisoning " +
    "later pair counts") {
    val sp = spark; import sp.implicits._
    // 'a' x5 merges to the 1-symbol word (a</w>) at step 1; steps 2+
    // must keep counting pairs from the other words exactly as the
    // reference does (a size-1 syms array fed to sequence(1, 0) would
    // emit [1, 0] -> a spurious or ANSI-throwing pair)
    val docs = Seq((1L, "a a a a a no no nob")).toDF("doc_id", "text")
    val freq = Map("a" -> 5L, "no" -> 2L, "nob" -> 1L)
    val expected = referenceBpe(freq, 4)
    val got = run(docs, 4)
    assert(got(0) == ((1L, "a", "</w>", 5L)),
      s"(a,</w>)@5 must merge first: ${got(0)}")
    assert(got == expected,
      s"post-single-symbol-word merges diverge:\n got $got\n exp $expected")
  }

  test("k caps the rule count and steps are 1..k in order") {
    val got = run(Tables.documents(spark, sf), 5)
    assert(got.map(_._1) == (1L to 5L))
    // frequencies are non-increasing is NOT a BPE law (later merges
    // can beat earlier residual pairs), but every freq is positive
    assert(got.forall(_._4 > 0))
  }

  /** Independent ENCODE reference: replay the training folds in rank
    * order — one leftmost-greedy non-overlapping pass per rule,
    * exactly [[referenceBpe]]'s merge step. The native expression uses
    * a different algorithm (min-rank-present loop), so equality here
    * is the encode<->train consistency law, not a mirror. */
  private def refEncode(text: String,
                        merges: Seq[(String, String)]): Seq[String] =
    text.split(" ").filter(_.nonEmpty).toSeq.flatMap { w =>
      var syms = w.split("").toVector :+ "</w>"
      merges.foreach { case (l, r) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { x =>
          if (out.nonEmpty && out.last == l && x == r) {
            out.remove(out.length - 1); out += (l + r)
          } else out += x
        }
        syms = out.toVector
      }
      syms
    }

  private def encodeAll(df: org.apache.spark.sql.DataFrame,
                        merges: Seq[(String, String)]) =
    df.select(col("doc_id"),
        graft.functions.GraftFunctions.bpeTokens(col("text"), merges)
          .as("tk"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap

  test("the in-driver heap trainer equals the per-step Spark foil " +
    "(size-gated, the CC-hybrid idiom), and a deep run's prefix " +
    "equals a shallow run") {
    val docs = Tables.documents(spark, sf)
    val viaDriver = run(docs, 8) // default gate: the driver path
    val old = TextAnalysis.DriverBpeMaxVocab
    TextAnalysis.DriverBpeMaxVocab = 0L // force the per-step Spark form
    val viaSpark = try run(docs, 8)
      finally TextAnalysis.DriverBpeMaxVocab = old
    assert(viaSpark == viaDriver,
      s"heap trainer diverges from the Spark foil:\n " +
        s"driver $viaDriver\n spark $viaSpark")
    // step t depends only on steps < t, so a deeper K must reproduce
    // the shallow run as its prefix — the law that lets the oracled
    // K=8 queries vouch for the deep trainer's early steps
    val deep = run(docs, 60)
    assert(deep.size == 60 && deep.take(8) == viaDriver,
      "deep-K prefix diverges from the shallow run")
    // exhaustion: the fixture vocabulary (31 distinct words, pair
    // bound ~138) runs dry far below a large K — training must stop
    // cleanly with consecutive steps, and the exhausted table fully
    // merges every corpus word to ONE symbol (no pairs left = every
    // word is a single token)
    val full = run(docs, 100000)
    assert(full.size < 100000 && full.map(_._1) == (1L to full.size),
      s"exhausted training malformed: ${full.size} rules")
    assert(full.take(60) == deep, "exhausted run breaks the prefix law")
    // trained rules always satisfy the rank-map training invariant
    // (a composite left/right symbol appears only after the rule that
    // creates it): encoding under the trained table validates it at
    // plan construction and must not throw
    val enc = encodeAll(docs.limit(5), full.map(m => (m._2, m._3)))
    assert(enc.nonEmpty && enc.values.forall(toks =>
      toks.forall(_.endsWith("</w>"))),
      "an exhausted table must merge every word to a single token")
  }

  test("native encode equals the rank-order training replay under " +
    "CORPUS-LEARNED merges (the encode<->train consistency law)") {
    val docs = Tables.documents(spark, sf)
    val merges = run(docs, 8).map(m => (m._2, m._3))
    val got = encodeAll(docs, merges)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == texts.size)
    texts.foreach { case (id, text) =>
      val exp = refEncode(text, merges)
      assert(got(id) == exp,
        s"doc $id: native ${got(id).take(20)} != replay ${exp.take(20)}")
    }
    // the encode must actually compress: fewer tokens than characters
    assert(got.values.map(_.size).sum <
      texts.values.map(_.split(" ").map(_.length + 1).sum).sum)
  }

  test("encode edge cases: greedy non-overlap, full-word merge, " +
    "empty/multi-space text, invalid tables rejected") {
    val sp = spark; import sp.implicits._
    def enc(text: String, merges: Seq[(String, String)]): Seq[String] =
      encodeAll(Seq((1L, text)).toDF("doc_id", "text"), merges)(1L)
    // greedy non-overlap: "aaaa" -> (aa)(aa), "aaa" -> (aa)(a)
    assert(enc("aaaa aaa", Seq(("a", "a"))) ==
      Seq("aa", "aa", "</w>", "aa", "a", "</w>"))
    // a word can merge to ONE symbol through the terminal
    assert(enc("a the", Seq(("a", "</w>"), ("t", "h"), ("th", "e"),
      ("the", "</w>"))) == Seq("a</w>", "the</w>"))
    // rank order beats textual adjacency: with (b,c) ranked first,
    // "abc" resolves b+c before a can pair
    assert(enc("abc", Seq(("b", "c"), ("a", "bc"))) == Seq("abc", "</w>"))
    // multiple/leading/trailing spaces collapse; empty text -> []
    assert(enc("  a  b ", Nil) == Seq("a", "</w>", "b", "</w>"))
    assert(enc("", Nil) == Seq.empty)
    // a rule referencing a symbol no earlier rule creates is rejected
    // at plan construction (the training invariant)
    intercept[IllegalArgumentException] {
      graft.functions.GraftFunctions.bpeTokens(col("text"),
        Seq(("th", "e")))
    }
    intercept[IllegalArgumentException] {
      graft.functions.GraftFunctions.bpeTokens(col("text"),
        Seq(("t", "h"), ("t", "h")))
    }
  }

  test("q_bpe_tokenize composes training and encode; q_bpe_encode's " +
    "fixed table fires on the corpus") {
    val docs = Tables.documents(spark, sf)
    val merges = run(docs, 8).map(m => (m._2, m._3))
    val got = SparkEntry.queries("q_bpe_tokenize")(spark, sf)
      .select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, text) =>
      assert(got(id) == refEncode(text, merges).size.toLong,
        s"doc $id token count diverges")
    }
    // the canonical fixed table must actually compress the corpus
    // (otherwise the oracled pair proves nothing about merging)
    val enc = SparkEntry.queries("q_bpe_encode")(spark, sf)
      .agg(sum("n_tokens")).head.getLong(0)
    val unmerged = texts.values.map { t =>
      val ws = t.split(" ").filter(_.nonEmpty)
      ws.length + ws.map(_.length).sum // chars + one </w> per word
    }.sum
    assert(enc < unmerged, s"canonical merges never fire: $enc >= $unmerged")
  }

  // ---- realistic merge-table size (K ~ 32k; the BpeScaleGate laws) ----

  test("32k inert rules leave the encode bit-identical (the " +
    "K-independence gate's controlled variable)") {
    val docs = Tables.documents(spark, sf)
    val base = TextAnalysis.CanonicalMerges
    val padded = base ++ TextAnalysis.inertMerges(32000)
    assert(padded.size == base.size + 32000)
    // the padded table passes the training-invariant validation at
    // full size (rankMap runs at column construction)
    val a = encodeAll(docs, base)
    val b = encodeAll(docs, padded)
    assert(a == b, "inert private-use rules changed the encode — " +
      "the inert alphabet must be disjoint from the corpus")
  }

  test("native encode equals the rank-order training replay under a " +
    "REALISTIC 32k merge table (K-independence of correctness)") {
    val table = TextAnalysis.syntheticMerges(32000)
    assert(table.size == 32000)
    // construction validates the training invariant at K=32k
    graft.functions.GraftFunctions.bpeTokens(col("text"), table)
    // the replay reference runs one greedy pass per rule per word —
    // 32k passes — so law-check a deterministic doc sample, not the
    // full corpus
    val docs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 100 === 7).limit(5)
    val got = encodeAll(docs, table)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(texts.nonEmpty, "fixture: sample must be non-empty")
    texts.foreach { case (id, text) =>
      val exp = refEncode(text, table)
      assert(got(id) == exp,
        s"doc $id: native ${got(id).take(20)} != replay ${exp.take(20)}")
    }
    // the dense table must fire heavily: adjacent lowercase letters
    // merge, so tokens come out well under character count
    val toks = got.values.map(_.size).sum
    val chars = texts.values.map(t =>
      t.split(" ").filter(_.nonEmpty).map(_.length + 1).sum).sum
    // (~0.6 measured: 2-char merges dominate, with (2char, 1char)
    // rules extending some to trigrams; anything near 1.0 means the
    // table is not firing)
    assert(toks.toDouble / chars < 0.75,
      s"32k table barely fires ($toks tokens vs $chars symbols) — " +
        "the realistic-cost measurement would be vacuous")
  }
}
