package graft

import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant

/** CLI option surface parity with the reference's commands
  * (ExportCommand.php:15-48, ImportCommand.php:33-44): flag parsing,
  * the timestamped default backup name, and the stdin confirmation
  * gate. Pure-function tests — no Spark session needed. */
class CliSpec extends AnyFunSuite {

  test("parseArgs splits positionals from --key value / --key=value") {
    val (pos, opts) = Cli.parseArgs(Seq(
      "export-live", "http://db", "--max_ipp", "500",
      "--output=backups/x", "--yes"))
    assert(pos == List("export-live", "http://db"))
    assert(opts == Map(
      "max_ipp" -> "500", "output" -> "backups/x", "yes" -> "true"))
  }

  test("--dry-run is a bare flag: it never swallows a positional") {
    val (pos, opts) = Cli.parseArgs(Seq("maintain", "--dry-run", "/corpus"))
    assert(pos == List("maintain", "/corpus"))
    assert(opts == Map("dry-run" -> "true"))
  }

  test("default backup name is <projectId>-<timestamp>, sanitized") {
    // BackupProcessor.php:22-24: project id is the host's first label;
    // generateCompressedBackup sanitizes [^a-zA-Z0-9]+ to '-'
    val name = Cli.defaultBackupName(
      "https://my-proj.firebaseio.com", Instant.parse("2026-08-12T10:30:00Z"))
    assert(name == "my-proj-2026-08-12T10-30-00Z"
      .replaceAll("[^a-zA-Z0-9]+", "-"))
    assert(name.startsWith("my-proj-2026-08-12"))
    assert(name.matches("[a-zA-Z0-9-]+"))
  }

  test("export-archive auto-shards by backup size, --shards overrides") {
    // ceil(bytes / 512MB), floor 1 (the single-file reference format),
    // cap 4096 (no million-file explosions from a bad size estimate)
    val M = 1024L * 1024
    assert(Cli.autoShards(0L) == 1)
    assert(Cli.autoShards(1L) == 1)
    assert(Cli.autoShards(512 * M) == 1)
    assert(Cli.autoShards(512 * M + 1) == 2)
    assert(Cli.autoShards(10L * 1024 * M) == 20)
    assert(Cli.autoShards(Long.MaxValue / 2) == 4096)
    // dirBytes: missing dir is 0 bytes -> 1 shard (never throws)
    assert(Cli.dirBytes("/tmp/definitely-missing-graft-dir") == 0L)
    val d = java.nio.file.Files.createTempDirectory("cli-bytes")
    java.nio.file.Files.write(d.resolve("a.parquet"), new Array[Byte](1000))
    val sub = java.nio.file.Files.createDirectory(d.resolve("sub"))
    java.nio.file.Files.write(sub.resolve("b.parquet"), new Array[Byte](500))
    assert(Cli.dirBytes(d.toString) == 1500L)
  }

  test("confirmation gate accepts only a literal yes line") {
    def gate(line: String): Boolean =
      Console.withOut(new java.io.ByteArrayOutputStream()) {
        Cli.confirm(new ByteArrayInputStream(line.getBytes(UTF_8)))
      }
    assert(gate("yes\n"))
    assert(gate("  yes  \n")) // trimmed, like the reference's trim()
    assert(!gate("no\n"))
    assert(!gate("y\n"))
    assert(!gate("YES\n")) // the reference compares exact lowercase
    assert(!gate(""))      // EOF = refuse
  }
}
