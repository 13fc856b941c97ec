package graft

import graft.sources.{MiniJson, Secrets, WatermarkStore}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Escape-correctness of the flat-JSON codec and its two consumers
  * (C1 secret documents, S14 watermark state). The previous regex
  * scanner silently mis-parsed `\"` in a value and broke on `{`; these
  * cases pin the loud-failure / exact-round-trip contract. */
class MiniJsonSpec extends AnyFunSuite {

  test("full escape set round-trips through render/parse") {
    val m = Map(
      "quote" -> """pa"ss""",
      "backslash" -> """a\b""",
      "brace" -> "v{a}l,ue:",
      "ws" -> "tab\there\nnewline\rcr",
      "unicode" -> "café ",
      "empty" -> "")
    assert(MiniJson.parseFlat(MiniJson.renderFlat(m)) == m)
  }

  test("parses standard JSON escapes including \\u") {
    val m = MiniJson.parseFlat("""{"k": "a\"b\\c\/dA\n"}""")
    assert(m("k") == "a\"b\\c/dA\n")
  }

  test("malformed documents fail loudly, never silently mis-parse") {
    val bad = Seq(
      """{"k": "v"""",            // unterminated document
      """{"k": "v} """,           // unterminated string
      """{"k": {"nested": "v"}}""", // nested object
      """{"k": ["v"]}""",         // array value
      """{"k": 1}""",             // non-string value
      """{"k": "v"} trailing""",  // trailing content
      """{"k": "a\x"}""",         // unsupported escape
      """{"k" "v"}""")            // missing colon
    bad.foreach { doc =>
      intercept[IllegalArgumentException](MiniJson.parseFlat(doc))
    }
  }

  test("reference-shaped wrapped secret (one key, nested flat object) unwraps") {
    // ingestion_lambda.py delivers the payload nested one level:
    // json.loads('{' + secret + '}')['crigglestone'].
    val wrapped =
      """{"crigglestone": {"host": "h", "dbname": "d", "username": "u",
        |  "password": "p{w\"d}", "port": "5433"}}""".stripMargin
    val m = MiniJson.parseFlatOrWrapped(wrapped)
    assert(m("host") == "h" && m("password") == """p{w"d}""" && m("port") == "5433")
    // The flat form still parses identically through the same entry point.
    assert(MiniJson.parseFlatOrWrapped("""{"a": "b"}""") == Map("a" -> "b"))
    // And Secrets consumes the wrapped form end-to-end.
    val sec = Secrets.fromJson(wrapped)
    assert(sec.url == "jdbc:postgresql://h:5433/d" && sec.properties.getProperty("password") == """p{w"d}""")
  }

  test("wrapped-form lookalikes still fail loudly") {
    val bad = Seq(
      """{"a": {"x": "y"}, "b": {"x": "y"}}""", // two wrapping keys
      """{"a": {"x": {"y": "z"}}}""",           // double nesting
      """{"a": ["x"]}""",                        // array value
      """{"a": {"x": "y"}} trailing""")          // trailing content
    bad.foreach { doc =>
      val e = intercept[IllegalArgumentException](MiniJson.parseFlatOrWrapped(doc))
      // The diagnostic names every attempted shape and chains the flat
      // parse error as the cause — not just "expected {".
      assert(e.getMessage.contains("attempted") && e.getCause != null, doc)
    }
    // Brace-less garbage reports that the re-braced unwrap was tried too.
    val e2 = intercept[IllegalArgumentException](MiniJson.parseFlatOrWrapped("not json at all"))
    assert(e2.getMessage.contains("re-braced"))
  }

  test("secret document with escaped quote in password yields exact credentials") {
    val s = Secrets.fromJson(
      """{"host": "h", "dbname": "d", "username": "u", "password": "p\"w{d}\\x"}""")
    assert(s.password == """p"w{d}\x""")
  }

  test("watermark state with hostile values round-trips through the file") {
    val f = Files.createTempDirectory("graft_wm").resolve("state.json")
    val store = new WatermarkStore(f.toString)
    val hostile = Map("ta\"ble" -> """2026-01-01 00:00:00.000001 {"x"}""")
    store.update(hostile)
    store.update(Map("plain" -> "2026-02-02 00:00:00.000000"))
    assert(store.read() == hostile + ("plain" -> "2026-02-02 00:00:00.000000"))
  }

  test("corrupt watermark file fails loudly instead of losing state") {
    val f = Files.createTempDirectory("graft_wm2").resolve("state.json")
    Files.writeString(f, """{"t": "v", garbage}""")
    intercept[IllegalArgumentException](new WatermarkStore(f.toString).read())
  }

  test("watermark update publishes via tmp + atomic rename, no residue") {
    val f = Files.createTempDirectory("graft_wm3").resolve("state.json")
    val store = new WatermarkStore(f.toString)
    store.update(Map("a" -> "1"))
    store.update(Map("b" -> "2"))
    assert(store.read() == Map("a" -> "1", "b" -> "2"))
    // The swap leaves no staging residue next to the state file.
    assert(!Files.exists(f.resolveSibling("state.json.tmp")))
  }

  test("crash before the watermark rename leaves the previous state intact") {
    val f = Files.createTempDirectory("graft_wm4").resolve("state.json")
    val store = new WatermarkStore(f.toString)
    store.update(Map("t" -> "2026-01-01 00:00:00.000000"))
    // Simulate a crash mid-update: the merged next state was fully (or
    // partially — same outcome) written to .tmp but never renamed.
    Files.writeString(f.resolveSibling("state.json.tmp"), """{"t": "torn""")
    // Reads resolve only the committed file: previous state, not the tmp.
    assert(store.watermark("t") == "2026-01-01 00:00:00.000000")
    // The next update overwrites the abandoned tmp and commits normally.
    store.update(Map("u" -> "2026-02-02 00:00:00.000000"))
    assert(store.read() == Map(
      "t" -> "2026-01-01 00:00:00.000000",
      "u" -> "2026-02-02 00:00:00.000000"))
    assert(!Files.exists(f.resolveSibling("state.json.tmp")))
  }

  test("torn watermark state file halts loudly before any extract could run") {
    val f = Files.createTempDirectory("graft_wm5").resolve("state.json")
    val store = new WatermarkStore(f.toString)
    store.update(Map("t" -> "2026-01-01 00:00:00.000000"))
    // A torn file can no longer be produced by update() (the swap's
    // recovery covers its own crash states — HostileFsSpec drills
    // them); simulate one arriving some OTHER way, with no .tmp to
    // recover from — truncation must fail the read, not bootstrap from
    // the sentinel and re-ingest. Since the round-15 Hadoop-FS port
    // the checksummed local FS surfaces the tear even before the JSON
    // parser would (ChecksumException vs IllegalArgumentException) —
    // either way LOUD, which is the contract.
    val full = Files.readString(f)
    Files.writeString(f, full.substring(0, full.length / 2))
    val e = intercept[Exception](store.watermark("t"))
    assert(e.isInstanceOf[IllegalArgumentException] ||
      e.isInstanceOf[java.io.IOException], s"unexpected failure shape: $e")
  }
}
