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
