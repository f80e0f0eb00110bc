package graft.cli

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** CLI contract smoke tests — the reference smoke-tests every bin/ tool
  * (tox.ini:16-25); here each subcommand's happy path runs end to end
  * with output-shape assertions (fetch --json matches
  * bin/whisper-fetch.py:72-82's shape).
  */
class CliSpec extends AnyFunSuite {
  // CLI sessions go through getOrCreate — reuse the test session
  private lazy val spark = SparkTestBase.spark

  private def run(args: String*): String = {
    spark // force session init before the CLI's builder runs
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      WhisperCli.main(args.toArray)
    }
    out.toString("UTF-8")
  }

  test("export-wsp → import-wsp migrates a metric through the binary format") {
    val store = Files.createTempDirectory("cli-wsp-a").toString
    val now = System.currentTimeMillis() / 1000
    val t1 = now - now % 60 - 120
    run("create", store, "cpu.load", "1m:1d")
    run("update", store, "cpu.load", s"$t1:1.5", s"${t1 + 60}:2.5")
    val wsp = Files.createTempDirectory("cli-wsp").resolve("cpu.load.wsp").toString
    assert(run("export-wsp", store, "cpu.load", wsp).contains("exported cpu.load"))

    val store2 = Files.createTempDirectory("cli-wsp-b").toString
    assert(run("import-wsp", store2, "cpu.load", wsp).contains("imported cpu.load"))
    val json = run("fetch", store2, "cpu.load",
      (t1 - 60).toString, (t1 + 120).toString, "--json")
    assert(json.contains("1.5") && json.contains("2.5"), json)
  }

  test("estimate prints the reference size model (whisper-create.py:71-72)") {
    val out = run("estimate", "60:1440")
    assert(out.contains("17308 bytes"))
    assert(out.contains("20480 bytes on disk"))
  }

  test("create → update → fetch --json → info round trip") {
    val store = Files.createTempDirectory("cli-store").toString
    val now = System.currentTimeMillis() / 1000
    val t1 = now - now % 60 - 120
    val t2 = t1 + 60

    assert(run("create", store, "cpu.load", "1m:1d,5m:7d").contains("created cpu.load"))
    assert(run("update", store, "cpu.load", s"$t1:1.5", s"$t2:2.5")
      .contains("updated 2 points"))

    val json = run("fetch", store, "cpu.load", (t1 - 60).toString, (t2 + 60).toString, "--json")
    assert(json.contains("\"start\":") && json.contains("\"step\": 60") &&
      json.contains("1.5") && json.contains("2.5"), json)

    val text = run("fetch", store, "cpu.load", (t1 - 60).toString, (t2 + 60).toString)
    assert(text.contains("None")) // dense grid pads missing slots
    val dropped = run("fetch", store, "cpu.load",
      (t1 - 60).toString, (t2 + 60).toString, "--drop", "nulls")
    assert(!dropped.contains("None"))

    val info = run("info", store, "cpu.load")
    assert(info.contains("average") && info.contains("0.5"), info)

    // no from/until → default last-24h window (bin/whisper-fetch.py:22-23)
    val defaulted = run("fetch", store, "cpu.load", "--drop", "nulls")
    assert(defaulted.contains("1.5") && defaulted.contains("2.5"), defaulted)
  }

  test("info single-field lookup and dump --raw re-ingestable output") {
    val store = Files.createTempDirectory("cli-store4").toString
    val now = System.currentTimeMillis() / 1000
    val t1 = now - now % 60 - 120
    run("create", store, "m", "1m:1d")
    run("update", store, "m", s"$t1:7.5")
    assert(run("info", store, "m", "aggregationMethod").trim == "average")
    assert(run("info", store, "m", "maxRetention").trim == "86400")
    val raw = run("dump", store, "m", "--raw")
    assert(raw.trim == s"$t1:7.5") // ts:value, whisper-dump.py:123-124
  }

  test("set-aggregation-method / set-xfilesfactor report old values") {
    val store = Files.createTempDirectory("cli-store2").toString
    run("create", store, "m", "1m:1h")
    assert(run("set-aggregation-method", store, "m", "max").contains("average"))
    assert(run("set-xfilesfactor", store, "m", "0.25").contains("0.5"))
  }

  test("resize --nobackup re-bins and drops the backup") {
    val store = Files.createTempDirectory("cli-store5").toString
    val now = System.currentTimeMillis() / 1000
    val t1 = now - now % 600 - 600
    run("create", store, "m", "1m:1d")
    run("update", store, "m", s"$t1:4.0", s"${t1 + 60}:6.0")
    val out = run("resize", store, "10m:2d", "0.0", "average", "--nobackup")
    assert(out.contains("no backup kept"), out)
    assert(!new java.io.File(s"$store.bak").exists())
    // re-binned: the two 1m points average into one 10m slot
    val fetched = run("fetch", store, "m", (t1 - 600).toString, (t1 + 600).toString,
      "--drop", "nulls")
    assert(fetched.contains("5.0"), fetched)
  }

  test("vacuum drops data past retention via the CLI") {
    val store = Files.createTempDirectory("cli-vacuum").toString
    val now = System.currentTimeMillis() / 1000
    val t1 = now - now % 60 - 120
    run("create", store, "cpu.load", "1m:1h")
    run("update", store, "cpu.load", s"$t1:1.5")
    // far-future clock: the whole retention window has expired
    assert(run("vacuum", store, (now + 864000).toString).contains("vacuumed"))
    val json = run("fetch", store, "cpu.load",
      (t1 - 60).toString, (t1 + 60).toString, "--json")
    assert(!json.contains("1.5"), json)
  }

  test("merge --from/--until clamps the copied interval (whisper-merge.py:18-24)") {
    val store = Files.createTempDirectory("cli-merge").toString
    val now = System.currentTimeMillis() / 1000
    val t1 = now - now % 60 - 240
    val t2 = t1 + 120
    run("create", store, "src", "1m:1h")
    run("create", store, "dst", "1m:1h")
    run("update", store, "src", s"$t1:1.0", s"$t2:2.0")
    // clamp excludes t1: only t2 lands in dst
    assert(run("merge", store, "src", "dst",
      "--from", (t1 + 60).toString).contains("merged src into dst"))
    val fetched = run("fetch", store, "dst",
      (t1 - 60).toString, (t2 + 60).toString, "--drop", "nulls")
    assert(fetched.contains("2.0") && !fetched.contains("1.0"), fetched)
  }

  test("diff output modes match bin/whisper-diff.py:41-112 shapes") {
    val store = Files.createTempDirectory("cli-diff").toString
    val now = System.currentTimeMillis() / 1000
    val t1 = now - now % 60 - 240
    val t2 = t1 + 60
    run("create", store, "a", "1m:1h")
    run("create", store, "b", "1m:1h")
    run("update", store, "a", s"$t1:1.5", s"$t2:7.0")
    run("update", store, "b", s"$t1:2.5", s"$t2:7.0") // t2 agrees

    // default pretty: exactly one differing slot; the reference's total
    // is the NON-EMPTY compared slots (2: t1 + t2), not the grid size —
    // verified against the executing bin/whisper-diff.py ("0 2 1") by
    // tools/DiffFuzz; the pre-r13 expectation (60) was a porting error
    val pretty = run("diff", store, "a", "b")
    assert(pretty.contains("Archive 0 (1 of 2 datapoints differ)"), pretty)
    assert(pretty.contains("%7s %11s %13s %13s".format("archive", "timestamp", "value_a", "value_b")), pretty)
    assert(pretty.contains("%7s %11d %13s %13s".format("", t1, "1.5", "2.5")), pretty)

    // --columns: flat rows, archive index leading
    val cols = run("diff", store, "a", "b", "--columns")
    assert(cols.contains(s"0 $t1 1.5 2.5"), cols)
    assert(cols.startsWith("archive timestamp value_a value_b"), cols)

    // --summary: per-archive counts in the reference column format
    val sumOut = run("diff", store, "a", "b", "--summary")
    assert(sumOut.contains("%7s %9s %9s".format("archive", "total", "differing")), sumOut)
    assert(sumOut.contains("%7s %9s %9s".format("0", "2", "1")), sumOut)

    // --no-headers suppresses the header row
    assert(!run("diff", store, "a", "b", "--summary", "--no-headers")
      .contains("differing"))

    // --json: sorted-key dict with path_a/path_b and datapoint list
    val js = run("diff", store, "a", "b", "--json")
    assert(js.contains("\"path_a\" : \"a\""), js)
    assert(js.contains("\"timestamp\" : " + t1), js)
    assert(js.contains("\"value_a\" : 1.5"), js)
    val sjs = run("diff", store, "a", "b", "--summary", "--json")
    assert(sjs.contains("\"points\" : 1") && sjs.contains("\"total\" : 2"), sjs)
    assert(!sjs.contains("datapoint"), sjs)

    // --until excludes the newest differing slot from the compare: the
    // new t2+60 disagreement falls outside (until = t2), so the compared
    // non-empty slots stay {t1, t2} — total 2, differing 1
    run("update", store, "a", s"${t2 + 60}:9.0")
    val clamped = run("diff", store, "a", "b", "--summary", "--until", t2.toString)
    assert(clamped.contains("%7s %9s %9s".format("0", "2", "1")), clamped)
  }

  test("validate reports invalid catalog rows") {
    val store = Files.createTempDirectory("cli-store3").toString
    run("create", store, "good", "1m:1h")
    val out = run("validate", store)
    assert(out.contains("all policies valid"), out)
  }
}
