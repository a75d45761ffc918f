package graft

import graft.pipeline.{Export, HttpRestClient, LiveExport, Restore, TreeCodec}

import java.nio.file.Files

/** The live HTTP pair — LiveExport's C1-C3 pagination against a stub
  * Firebase server, HttpKVSink's PATCH restore, and the full
  * export -> parquet -> restore round-trip over the wire (the
  * reference's whole lifecycle, BackupProcessor + RestoreProcessor,
  * with Spark in the middle). */
class LiveSpec extends SparkSuite {

  private val wideTree: String = {
    // 120 keys at /users so ipp=16 needs several pages; a nested branch
    // and scalar leaves so flattening is exercised
    val users = (1 to 120).map(i =>
      s""""u${"%03d".format(i)}": {"name": "user$i", "score": $i}""")
      .mkString(",")
    s"""{"users": {$users},
        "config": {"mode": "live", "depth": {"a": 1, "b": 2}},
        "version": 7}"""
  }

  private def edgesOf(json: String): Set[TreeCodec.Edge] =
    TreeCodec.flatten(json).toSet

  test("walker fetches a whole tree page by page (C1 keyset pagination)") {
    val stub = new FirebaseStub()
    try {
      stub.seed(wideTree)
      val walker = new LiveExport.Walker(
        new HttpRestClient(stub.url), maxIpp = 16)
      val got = (walker.fetchTree("/users") ++ walker.fetchTree("/config") ++
        walker.fetchTree("/version")).toSet
      assert(got == edgesOf(wideTree))
      // keyset pagination really paged: 120 keys / 16-ipp pages means
      // at least 8 GETs for /users alone
      assert(stub.getCount.get() >= 8)
    } finally stub.stop()
  }

  test("payload-too-large shrinks the page size, then succeeds (C2)") {
    // each user entry is ~40 bytes; cap pages at ~300 bytes so ipp=1000
    // must halve several times before pages fit
    val stub = new FirebaseStub(maxPayloadBytes = 300)
    try {
      stub.seed(wideTree)
      val walker = new LiveExport.Walker(new HttpRestClient(stub.url))
      val got = walker.fetchTree("/users").toSet
      assert(got == edgesOf(wideTree).filter(_.path.startsWith("/users")))
    } finally stub.stop()
  }

  test("a child too fat for the floor triggers go-deeper recursion (C3)") {
    // /big/fat is one child whose serialized size exceeds the payload
    // cap, so even a MIN_IPP page at /big fails -> shallow listing ->
    // descend into /big/fat where the small leaves page fine
    val fat = (1 to 200).map(i => s""""k$i": "${"x" * 10}$i"""").mkString(",")
    val json = s"""{"big": {"fat": {$fat}, "thin": 1}, "tiny": 2}"""
    val stub = new FirebaseStub(maxPayloadBytes = 600)
    try {
      stub.seed(json)
      val walker = new LiveExport.Walker(new HttpRestClient(stub.url))
      val got = walker.fetchTree("/big").toSet
      assert(got == edgesOf(json).filter(_.path.startsWith("/big")))
    } finally stub.stop()
  }

  test("shallow listing failing 10x raises BackupFailure (retry cap)") {
    // go-deeper needs shallow keys; the stub answers null 10 times
    val fat = (1 to 200).map(i => s""""k$i": "${"x" * 10}$i"""").mkString(",")
    val stub = new FirebaseStub(maxPayloadBytes = 600, failShallow = 10)
    try {
      stub.seed(s"""{"big": {"fat": {$fat}}}""")
      val walker = new LiveExport.Walker(new HttpRestClient(stub.url))
      intercept[LiveExport.BackupFailure] { walker.fetchTree("/big") }
    } finally stub.stop()
  }

  test("shallow listing recovering within 10 tries succeeds") {
    val fat = (1 to 200).map(i => s""""k$i": "${"x" * 10}$i"""").mkString(",")
    val json = s"""{"big": {"fat": {$fat}}}"""
    val stub = new FirebaseStub(maxPayloadBytes = 600, failShallow = 9)
    try {
      stub.seed(json)
      val walker = new LiveExport.Walker(new HttpRestClient(stub.url))
      assert(walker.fetchTree("/big").toSet == edgesOf(json))
    } finally stub.stop()
  }

  test("distributed export reads the live database into the edge frame") {
    val stub = new FirebaseStub()
    try {
      stub.seed(wideTree)
      val u = stub.url // capture the string, not the stub
      val df = LiveExport.export(spark, () => new HttpRestClient(u))
      val got = df.collect().map(r =>
        TreeCodec.Edge(r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(got == edgesOf(wideTree))
    } finally stub.stop()
  }

  test("HttpKVSink PATCHes batches; drainPath shrinks on rejection") {
    // sink rejects >8-key patches: drainPath must halve down from 50
    val stub = new FirebaseStub(maxPatchKeys = 8)
    try {
      val sink = new Restore.HttpKVSink(stub.url)
      val data = (1 to 50).map(i => s"k$i" -> i.toString).toMap
      Restore.drainPath(sink, "/dst", data)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val dst = mapper.readTree(stub.snapshot()).get("dst")
      assert(dst.size() == 50)
      assert(dst.get("k17").asInt() == 17)
      // really was batched adaptively, not per-key
      assert(stub.patchCount.get() < 50)
    } finally stub.stop()
  }

  test("live round-trip: HTTP export -> parquet backup -> HTTP restore") {
    val src = new FirebaseStub()
    val dst = new FirebaseStub()
    try {
      src.seed(wideTree)
      val srcUrl = src.url
      val edges = LiveExport.export(spark, () => new HttpRestClient(srcUrl))
      val dir = Files.createTempDirectory("live_rt").toString
      Export.writeBackup(edges, dir, numPartitions = 4)
      val back = Export.readBackup(spark, dir)
      Restore.restore(back, new Restore.HttpKVSink(dst.url))
      assert(TreeCodec.jsonEqual(dst.snapshot(), wideTree))
    } finally { src.stop(); dst.stop() }
  }
}
