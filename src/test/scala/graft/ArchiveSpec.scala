package graft

import graft.pipeline.{Archive, TreeCodec}
import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.commons.compress.compressors.gzip.GzipCompressorOutputStream

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

/** The reference-archive source: a tar.gz built exactly the way the PHP
  * tool builds one (md5-ish chunk names + metadata.json manifest,
  * BackupProcessor.php:202-242) must decode to the engine's canonical
  * leaf-edge frame — including flattening chunk values that are whole
  * subtrees. */
class ArchiveSpec extends SparkSuite {

  private def buildArchive(entries: Map[String, String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val tar = new TarArchiveOutputStream(new GzipCompressorOutputStream(bos))
    entries.foreach { case (name, content) =>
      val bytes = content.getBytes(UTF_8)
      val e = new TarArchiveEntry(name)
      e.setSize(bytes.length)
      tar.putArchiveEntry(e)
      tar.write(bytes)
      tar.closeArchiveEntry()
    }
    tar.close()
    bos.toByteArray
  }

  private val archive = buildArchive(Map(
    "metadata.json" ->
      """{"/": ["c1.json"], "/users": ["c2.json", "c3.json"]}""",
    "c1.json" -> """{"title": "hello", "count": 3}""",
    // subtree value (a page the reference fetched without descending)
    // next to a scalar sibling
    "c2.json" -> """{"u1": {"name": "a", "age": 1}, "u2": "flat"}""",
    "c3.json" -> """{"u3": {"deep": {"x": true}}}"""))

  private val expected = Set(
    TreeCodec.Edge("/", "title", "\"hello\""),
    TreeCodec.Edge("/", "count", "3"),
    TreeCodec.Edge("/users/u1", "name", "\"a\""),
    TreeCodec.Edge("/users/u1", "age", "1"),
    TreeCodec.Edge("/users", "u2", "\"flat\""),
    TreeCodec.Edge("/users/u3/deep", "x", "true"))

  test("archive bytes decode to leaf edges, subtree chunks flattened") {
    assert(Archive.edgesFromArchive(archive).toSet == expected)
  }

  test("readReferenceArchive reads a tar.gz file through binaryFile") {
    val dir = Files.createTempDirectory("graft-archive")
    val f = dir.resolve("backup-2026.tar.gz").toFile
    val out = new FileOutputStream(f)
    out.write(archive); out.close()

    val rows = Archive.readReferenceArchive(spark, f.getAbsolutePath)
      .collect()
      .map(r => TreeCodec.Edge(r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(rows == expected)
  }

  test("a decoded archive re-assembles to the merged source tree") {
    val json = TreeCodec.assemble(Archive.edgesFromArchive(archive))
    assert(TreeCodec.jsonEqual(json,
      """{"title": "hello", "count": 3, "users": {
        |  "u1": {"name": "a", "age": 1}, "u2": "flat",
        |  "u3": {"deep": {"x": true}}}}""".stripMargin))
  }

  test("an archive without metadata.json is rejected") {
    val bad = buildArchive(Map("c1.json" -> "{}"))
    intercept[IllegalArgumentException] { Archive.edgesFromArchive(bad) }
  }
}
