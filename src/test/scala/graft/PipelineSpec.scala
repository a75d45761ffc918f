package graft

import graft.pipeline.{Export, Restore, TreeCodec}
import graft.pipeline.TreeCodec.Edge
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** The reference's implicit contract: export then import reproduces the
  * database (SURVEY.md §5 "round-trip laws"). Random JSON trees via
  * ScalaCheck; flatten/assemble as pure functions; the full Spark
  * export->parquet->restore path against an in-memory sink, including
  * the adaptive shrink/grow batching under injected failures. */
class PipelineSpec extends SparkSuite {

  // --- random JSON trees (object-rooted, modest depth/width) ----------
  private val scalarGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(s => "\"" + s.take(8) + "\""),
    Gen.chooseNum(-1000000, 1000000).map(_.toString),
    Gen.oneOf("true", "false", "null"),
    Gen.chooseNum(-1000.0, 1000.0).map(_.toString))

  private val keyGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(6))

  private def treeGen(depth: Int): Gen[String] =
    if (depth <= 0) scalarGen
    else Gen.choose(1, 4).flatMap { width =>
      Gen.listOfN(width, for {
        k <- keyGen
        v <- Gen.frequency(3 -> scalarGen, 2 -> Gen.lzy(treeGen(depth - 1)))
      } yield s""""$k": $v""")
        .map(_.distinctBy(_.takeWhile(_ != ':')).mkString("{", ",", "}"))
    }

  test("flatten/assemble round-trip on random trees") {
    // plain ScalaCheck Gen with a fixed seed (scalatestplus bridge is
    // not in the offline cache): 50 deterministic random trees
    var seed = Seed(42L)
    (1 to 50).foreach { _ =>
      val json = treeGen(4).apply(Gen.Parameters.default, seed)
        .getOrElse(sys.error("gen failed"))
      seed = seed.next
      val edges = TreeCodec.flatten(json)
      val back = TreeCodec.assemble(edges)
      // arrays round-trip as integer-keyed objects (Firebase encoding),
      // and our generator emits none, so equality is exact
      assert(TreeCodec.jsonEqual(json, back),
        s"round-trip failed:\n in=$json\nout=$back")
    }
  }

  test("flatten paths follow the reference's slash-concatenation") {
    val edges = TreeCodec.flatten("""{"a": {"b": {"c": 1}}, "d": 2}""")
    assert(edges.toSet == Set(
      Edge("/a/b", "c", "1"), Edge("/", "d", "2")))
  }

  test("permissive flatten quarantines malformed documents") {
    val sp = spark; import sp.implicits._
    val in = Seq(("/", """{"a": 1}"""), ("/", """{not json"""))
    val rows = Export.flattenTrees(in.toDS()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set(
      ("/", "a", "1"), ("/", Export.CorruptKey, """{not json""")))
    // strict mode propagates the parse failure
    intercept[org.apache.spark.SparkException] {
      Export.flattenTrees(in.toDS(), permissive = false).collect()
    }
  }

  test("subtree export scopes to one node (the reference's path arg)") {
    val sp = spark; import sp.implicits._
    val json = """{"a": {"b": {"c": 1}, "x": 2}, "ab": {"y": 3}, "d": 4}"""
    val rows = Export.flattenTrees(Seq(("/", json)).toDS())
    val under = Export.subtree(rows, "/a").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // /ab must NOT match the /a prefix; /a's own edges and /a/b's do
    assert(under == Set(("/a/b", "c"), ("/a", "x")))
    assert(Export.subtree(rows, "/").count() == rows.count())
  }

  test("arrays flatten to integer keys") {
    val edges = TreeCodec.flatten("""{"xs": [10, {"y": 1}]}""")
    assert(edges.toSet == Set(
      Edge("/xs", "0", "10"), Edge("/xs/1", "y", "1")))
  }

  // --- adaptive restore batching (RestoreProcessor.php:70-106) --------
  private class MemorySink(failAbove: Int = Int.MaxValue)
      extends Restore.KVSink {
    val store = new ConcurrentHashMap[(String, String), String]()
    var calls = 0
    override def update(path: String, batch: Map[String, String]): Boolean = {
      calls += 1
      if (batch.size > failAbove) false
      else { batch.foreach { case (k, v) => store.put((path, k), v) }; true }
    }
  }

  test("drainPath delivers everything in order on a healthy sink") {
    val sink = new MemorySink()
    val data = (1 to 2500).map(i => f"k$i%05d" -> i.toString).toMap
    Restore.drainPath(sink, "/p", data)
    assert(sink.store.size == 2500)
    assert(sink.store.get(("/p", "k02500")) == "2500")
  }

  test("drainPath shrinks to the sink's capacity and still drains") {
    val sink = new MemorySink(failAbove = 7) // payload-too-large analog
    val data = (1 to 100).map(i => f"k$i%03d" -> i.toString).toMap
    Restore.drainPath(sink, "/p", data, sleep = _ => ())
    assert(sink.store.size == 100)
    // must have shrunk 1000->...->7 wards: more calls than a perfect
    // 100/7 split but bounded well below per-key writes + retries
    assert(sink.calls > 100 / 7 && sink.calls < 100)
  }

  test("drainPath grows the batch after sustained success") {
    val sink = new MemorySink()
    val data = (1 to 50).map(i => f"k$i%03d" -> i.toString).toMap
    // start tiny: min(1000, size)=50, no growth observable; instead
    // drive with a small initial via a capacity-limited then healed sink
    var failures = 3
    val flaky = new Restore.KVSink {
      var sizes = List.empty[Int]
      override def update(p: String, b: Map[String, String]): Boolean = {
        sizes ::= b.size
        if (failures > 0) { failures -= 1; false } else true
      }
    }
    Restore.drainPath(flaky, "/p", data, sleep = _ => ())
    val sizes = flaky.sizes.reverse
    // after shrinking 50->25->13->7, five successes at 7 then growth
    assert(sizes.take(4) == List(50, 25, 13, 7))
    assert(sizes.exists(_ > 7), s"batch never grew: $sizes")
  }

  test("drainPath batch growth is capped at the reference's 1000 ceiling") {
    // unbounded x1.2 growth would eventually serialize+send a body the
    // server must reject, then oscillate around its limit forever; the
    // reference contract is batches of UP TO 1000 key-writes
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    val sink = new Restore.KVSink {
      override def update(p: String, b: Map[String, String]): Boolean = {
        sizes += b.size; true
      }
    }
    val data = (1 to 20000).map(i => f"k$i%06d" -> i.toString).toMap
    Restore.drainPath(sink, "/p", data, sleep = _ => ())
    assert(sizes.max == Restore.InitialBatch,
      s"batch exceeded the ceiling: ${sizes.max}")
    assert(sizes.forall(_ <= Restore.InitialBatch))
  }

  test("unsinkable data raises (RestoreFailureException analog)") {
    val sink = new MemorySink(failAbove = 0)
    intercept[IllegalStateException] {
      Restore.drainPath(sink, "/p", Map("k" -> "1"), maxStalled = 8,
        sleep = _ => ())
    }
  }

  // --- full Spark path: flatten -> export -> read -> restore ----------
  test("spark export/restore round-trip preserves every leaf") {
    val sp = spark; import sp.implicits._
    val trees = Seq(
      "/" -> """{"users": {"u1": {"name": "ada", "age": 36},
                           "u2": {"name": "lin"}},
                 "cfg": {"on": true}}""",
      "/apps/a1" -> """{"k1": 1, "k2": [5, 6]}"""
    ).toDS()
    val rows = Export.flattenTrees(trees)
    val dir = Files.createTempDirectory("graft_backup").toString
    Export.writeBackup(rows, dir, numPartitions = 3)

    val back = Export.readBackup(spark, dir)
    assert(back.count() == rows.count())

    // restore through the adaptive sink and compare leaf-for-leaf
    val sink = new MemorySink()
    SinkRegistry.sinks.put("rt", sink)
    Restore.restore(back, RegistrySink("rt"))
    val expected = rows.collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getString(2))).toMap
    assert(sink.store.asScala.toMap == expected)

    // manifest accounts for every path
    val mf = Export.manifest(spark, back).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mf.values.sum == rows.count())
    assert(mf.keySet == expected.keySet.map(_._1))
  }

}

/** JVM-static sink registry: the task closure carries only a string id
  * (serializable); update() resolves the live sink through the shared
  * JVM (local-mode test only — a cluster sink would own its client). */
object SinkRegistry {
  val sinks = new ConcurrentHashMap[String, Restore.KVSink]()
}

final case class RegistrySink(id: String) extends Restore.KVSink {
  override def update(path: String, batch: Map[String, String]): Boolean =
    SinkRegistry.sinks.get(id).update(path, batch)
}
