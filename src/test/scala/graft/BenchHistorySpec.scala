package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench-history monotonicity guard (VERDICT r16 #1): a recorded
  * best may fall via the rolling min freely, but may only RISE through
  * an explicit adoption — attributed on stderr and recorded in
  * bench_adoptions.jsonl. Round 16 shipped one unattributed 322→867ms
  * loosening; these tests prove the writer now clamps exactly that
  * class, including a hand edit landing between the suite's history
  * read and its write (the on-disk re-read path).
  */
class BenchHistorySpec extends AnyFunSuite {

  private def tempDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft-hist").toFile
    d.deleteOnExit(); d
  }

  private def writeHist(f: java.io.File, entries: Map[String, Long]): Unit = {
    val w = new java.io.PrintWriter(f, "UTF-8")
    try w.println(entries.toSeq.sorted.map { case (k, v) => s""" "$k":$v""" }
      .mkString("{\n", ",\n", "\n}")) finally w.close()
  }

  private def readHist(f: java.io.File): Map[String, Long] = {
    val src = scala.io.Source.fromFile(f, "UTF-8")
    val txt = try src.mkString finally src.close()
    "\"([^\"]+)\":\\s*(\\d+)".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
  }

  test("unattributed upward move is clamped to the on-disk best") {
    val dir = tempDir()
    val hist = new java.io.File(dir, "bench_history.json")
    writeHist(hist, Map("sf0.1/a" -> 322L, "sf0.1/b" -> 100L))
    // merged carries one legitimate rolling-min drop (b) and one
    // unexplained upward revision (a: the r16 corpus_card class)
    Bench.writeHistoryGuarded(hist,
      Map("sf0.1/a" -> 867L, "sf0.1/b" -> 80L), Map.empty, "confirm")
    val out = readHist(hist)
    assert(out("sf0.1/a") === 322L, "upward move without adoption must be refused")
    assert(out("sf0.1/b") === 80L, "rolling min must still apply")
    assert(!new java.io.File(dir, "bench_adoptions.jsonl").exists(),
      "a refused move must not mint an adoption record")
  }

  test("adopted upward move lands AND leaves a ledger record") {
    val dir = tempDir()
    val hist = new java.io.File(dir, "bench_history.json")
    writeHist(hist, Map("sf0.1/a" -> 322L))
    Bench.writeHistoryGuarded(hist,
      Map("sf0.1/a" -> 600L), Map("sf0.1/a" -> 600L), "stale-best")
    assert(readHist(hist)("sf0.1/a") === 600L)
    val ledger = new java.io.File(dir, "bench_adoptions.jsonl")
    assert(ledger.exists(), "an effective adoption must be recorded")
    val src = scala.io.Source.fromFile(ledger, "UTF-8")
    val lines = try src.getLines().toList finally src.close()
    assert(lines.size === 1)
    assert(lines.head.contains(""""key":"sf0.1/a""""))
    assert(lines.head.contains(""""old":322"""))
    assert(lines.head.contains(""""adopted":600"""))
    assert(lines.head.contains(""""arm":"stale-best""""))
  }

  test("hand edit between read and write is caught by the on-disk re-read") {
    val dir = tempDir()
    val hist = new java.io.File(dir, "bench_history.json")
    writeHist(hist, Map("sf0.1/a" -> 500L))
    // the suite read the file when a stale 900 was present, computed a
    // rolling min of 900; meanwhile the file was corrected to 500 — the
    // write must not resurrect the higher number
    Bench.writeHistoryGuarded(hist, Map("sf0.1/a" -> 900L), Map.empty, "confirm")
    assert(readHist(hist)("sf0.1/a") === 500L)
  }

  test("downward moves and fresh keys pass untouched, no ledger minted") {
    val dir = tempDir()
    val hist = new java.io.File(dir, "bench_history.json")
    writeHist(hist, Map("sf0.1/a" -> 500L))
    Bench.writeHistoryGuarded(hist,
      Map("sf0.1/a" -> 450L, "sf0.1/new" -> 1234L), Map.empty, "confirm")
    val out = readHist(hist)
    assert(out === Map("sf0.1/a" -> 450L, "sf0.1/new" -> 1234L))
    assert(!new java.io.File(dir, "bench_adoptions.jsonl").exists())
  }

  test("adoption below the on-disk value needs no ledger (it is a rolling min)") {
    val dir = tempDir()
    val hist = new java.io.File(dir, "bench_history.json")
    writeHist(hist, Map("sf0.1/a" -> 500L))
    Bench.writeHistoryGuarded(hist,
      Map("sf0.1/a" -> 400L), Map("sf0.1/a" -> 400L), "confirm")
    assert(readHist(hist)("sf0.1/a") === 400L)
    assert(!new java.io.File(dir, "bench_adoptions.jsonl").exists(),
      "a non-upward adoption is ordinary history motion, not a loosening")
  }
}
