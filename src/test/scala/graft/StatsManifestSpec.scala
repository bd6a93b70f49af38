package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.StatsManifest

class StatsManifestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("zValue interleaves bits: known values, and locality beats concatenation") {
    val got = spark.range(1)
      .select(
        StatsManifest.zValue(lit(3L), lit(1L)).as("z31"),
        StatsManifest.zValue(lit(1L), lit(3L)).as("z13"),
        StatsManifest.zValue(lit(0L), lit(0L)).as("z00"),
        StatsManifest.zValue(lit(65535L), lit(65535L)).as("zmax"))
      .head()
    // a-bits land at even positions, b-bits at odd ones
    assert(got.getLong(0) === 7L)   // a=11 -> 101, b=01 -> 010
    assert(got.getLong(1) === 11L)  // a=01 -> 001, b=11 -> 1010
    assert(got.getLong(2) === 0L)
    assert(got.getLong(3) === (1L << 32) - 1)
  }

  test("zValueN interleaves k ways: known values, 2-D case matches zValue") {
    val got = spark.range(1)
      .select(
        StatsManifest.zValueN(Seq(lit(1L), lit(1L), lit(1L))).as("z111"),
        // bit i of col j lands at i·k + j: col0 bit1 → 3, col2 bit0 → 2
        StatsManifest.zValueN(Seq(lit(2L), lit(0L), lit(1L))).as("z201"),
        StatsManifest.zValueN(Seq(lit(3L), lit(1L)), 16).as("z2d"),
        StatsManifest.zValue(lit(3L), lit(1L)).as("zOld"))
      .head()
    assert(got.getLong(0) === 7L)
    assert(got.getLong(1) === 12L)
    assert(got.getLong(2) === got.getLong(3))
  }

  test("appendClustered stats only the new files; old manifest rows carried verbatim") {
    val dir = Files.createTempDirectory("graft-append").toString
    val (first, second) = (orders.where(col("o_orderkey") % 2 === 0),
      orders.where(col("o_orderkey") % 2 === 1))
    StatsManifest.writeClustered(first, dir, col("o_totalprice"), Seq("o_totalprice"), nFiles = 4)
    val m0 = StatsManifest.readManifest(spark, dir).collect()
      .map(r => r.getString(0) -> r.toSeq).toMap
    val newFiles = StatsManifest.appendClustered(second, dir, col("o_totalprice"),
      Seq("o_totalprice"), nFiles = 4)
    // the incremental stats pass covered exactly the appended files
    assert(newFiles.size === 4)
    assert(newFiles.forall(f => !m0.keys.exists(_.endsWith(new java.io.File(f).getName))))
    val m1 = StatsManifest.readManifest(spark, dir).collect()
      .map(r => r.getString(0) -> r.toSeq).toMap
    assert(m1.size === m0.size + newFiles.size)
    // pre-existing rows are byte-identical: never re-scanned, never re-stat'd
    m0.foreach { case (f, row) => assert(m1(f) === row) }
    // the merged manifest still accounts for every row, and pruned
    // answers stay exact across the commit boundary
    assert(m1.values.map(_.last.asInstanceOf[Long]).sum === orders.count())
    val (df, _, total) = StatsManifest.scanPruned(spark, dir,
      Seq(("o_totalprice", lit(200000.0), lit(250000.0))))
    assert(total === 8L)
    assert(df.count() === orders.where(col("o_totalprice").between(200000.0, 250000.0)).count())
  }

  test("manifest covers every file and every row") {
    val dir = Files.createTempDirectory("graft-manifest").toString
    StatsManifest.writeClustered(orders, dir, col("o_totalprice"),
      Seq("o_totalprice", "o_custkey"), nFiles = 8)
    val m = StatsManifest.readManifest(spark, dir)
    assert(m.count() === 8L)
    assert(m.agg(sum("n_rows")).head().getLong(0) === orders.count())
    // clustered layout: per-file price intervals are pairwise disjoint
    val iv = m.select("min_o_totalprice", "max_o_totalprice")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).sortBy(_._1)
    iv.sliding(2).foreach {
      case Array(a, b) => assert(a._2 <= b._1, s"overlapping file intervals $a $b")
      case _ =>
    }
  }

  test("range scan prunes files and answers exactly like the full scan") {
    val dir = Files.createTempDirectory("graft-prune").toString
    StatsManifest.writeClustered(orders, dir, col("o_totalprice"),
      Seq("o_totalprice"), nFiles = 8)
    val (df, scanned, total) = StatsManifest.scanPruned(spark, dir,
      Seq(("o_totalprice", lit(200000.0), lit(250000.0))))
    assert(total === 8L)
    assert(scanned < total, s"no files skipped: $scanned of $total")
    val want = orders.where(col("o_totalprice").between(200000.0, 250000.0))
    assert(df.count() === want.count())
    assert(df.agg(sum("o_orderkey")).head().getLong(0) ===
      want.agg(sum("o_orderkey")).head().getLong(0))
  }

  test("a 2-D box prunes under z-order where the linear layout cannot") {
    val zDir = Files.createTempDirectory("graft-z").toString
    val linDir = Files.createTempDirectory("graft-lin").toString
    val stats = Seq("o_custkey", "o_totalprice")
    StatsManifest.writeClustered(orders, zDir,
      StatsManifest.zValue(col("o_custkey"), floor(col("o_totalprice") / 10000)),
      stats, nFiles = 16)
    // linear layout clustered on price alone: no custkey locality
    StatsManifest.writeClustered(orders, linDir, col("o_totalprice"), stats, nFiles = 16)
    // selective predicate on custkey ONLY — orthogonal to the linear sort
    val preds = Seq(("o_custkey", lit(100L), lit(200L)))
    val (zDf, zScanned, zTotal) = StatsManifest.scanPruned(spark, zDir, preds)
    val (lDf, lScanned, _) = StatsManifest.scanPruned(spark, linDir, preds)
    assert(zScanned < zTotal, "z-order layout must skip files on the second dimension")
    assert(zScanned < lScanned,
      s"z-order ($zScanned files) should beat the linear layout ($lScanned files)")
    // skipping never changes the answer
    assert(zDf.count() === lDf.count())
    val want = orders.where(col("o_custkey").between(100L, 200L)).count()
    assert(zDf.count() === want)
  }

  test("a 3-D box prunes under 3-way z-order at least as well as a linear layout") {
    val zDir = Files.createTempDirectory("graft-z3").toString
    val linDir = Files.createTempDirectory("graft-lin3").toString
    val stats = Seq("o_custkey", "o_totalprice", "o_orderkey")
    StatsManifest.writeClustered(orders, zDir,
      StatsManifest.zValueN(Seq(col("o_custkey"), floor(col("o_totalprice") / 10000),
        floor(col("o_orderkey") / 64))),
      stats, nFiles = 16)
    StatsManifest.writeClustered(orders, linDir, col("o_totalprice"), stats, nFiles = 16)
    // box over the two dimensions ORTHOGONAL to the linear sort
    val preds = Seq(
      ("o_custkey", lit(100L), lit(400L)),
      ("o_orderkey", lit(1000L), lit(3000L)))
    val (zDf, zScanned, zTotal) = StatsManifest.scanPruned(spark, zDir, preds)
    val (lDf, lScanned, _) = StatsManifest.scanPruned(spark, linDir, preds)
    assert(zScanned < zTotal, "3-D z-order must skip files on non-leading dimensions")
    assert(zScanned <= lScanned,
      s"3-D z-order ($zScanned files) must not lose to the linear layout ($lScanned)")
    // skipping never changes the answer
    val want = orders.where(col("o_custkey").between(100L, 400L)
      && col("o_orderkey").between(1000L, 3000L)).count()
    assert(zDf.count() === want)
    assert(lDf.count() === want)
  }

  test("bloom skipping prunes the anti-clustered point lookup that min/max cannot") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
    val dir = java.nio.file.Files.createTempDirectory("graft-bloomscan").toString
    StatsManifest.writeClustered(orders, dir, col("o_orderdate"),
      Seq("o_orderdate", "o_custkey"), nFiles = 16)
    val blooms = StatsManifest.bloomsOf(spark, StatsManifest.listDataFiles(dir), "o_custkey")
    // the premise: the layout is clustered on DATE, so EVERY file's
    // custkey interval covers the probe — range pruning keeps all files
    val cust = 42L
    val m = StatsManifest.readManifest(spark, dir)
    assert(m.where(col("min_o_custkey") <= cust && col("max_o_custkey") >= cust).count()
      === m.count(), "fixture broke: min/max pruning was already selective")
    val (df, scanned, total) = StatsManifest.scanBloomPruned(spark, blooms, "o_custkey", cust)
    assert(scanned < total, s"blooms skipped nothing: $scanned of $total")
    // no false negatives: the pruned read returns exactly the rows
    val want = orders.where(col("o_custkey") === cust)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === want)
    assert(want.nonEmpty)
  }

  test("hilbert index: bijection on the grid, every curve step is grid-adjacent") {
    import graft.functions.HilbertIndex2
    val bits = 3 // full 8x8 grid, exhaustively
    val cells = for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)
    val d = cells.map { case (x, y) => (x, y) -> HilbertIndex2.index(x, y, bits) }.toMap
    // bijection onto [0, 64)
    assert(d.values.toSeq.sorted === (0L until 64L).toSeq)
    // THE Hilbert property Z-order lacks: consecutive curve positions
    // are always grid neighbors (Manhattan distance exactly 1)
    val byD = d.map(_.swap)
    for (i <- 0L until 63L) {
      val (x1, y1) = byD(i); val (x2, y2) = byD(i + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L, s"step $i not adjacent")
    }
    // clamping is order-preserving at the edges
    assert(HilbertIndex2.index(-5, 3, bits) === HilbertIndex2.index(0, 3, bits))
    assert(HilbertIndex2.index(99, 3, bits) === HilbertIndex2.index(7, 3, bits))
    // the Column path (codegen) agrees with the static loop
    val viaDf = cells.toDF("x", "y")
      .select(col("x"), col("y"), HilbertIndex2.hilbert(col("x"), col("y"), bits).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(viaDf === d)
  }

  test("a 2-D box prunes under hilbert clustering at least as well as the linear layout") {
    import graft.functions.HilbertIndex2
    val hDir = Files.createTempDirectory("graft-h").toString
    val linDir = Files.createTempDirectory("graft-hl").toString
    val stats = Seq("o_custkey", "o_totalprice")
    StatsManifest.writeClustered(orders, hDir,
      HilbertIndex2.hilbert(col("o_custkey"),
        floor(col("o_totalprice") / 10000).cast("long")),
      stats, nFiles = 16)
    StatsManifest.writeClustered(orders, linDir, col("o_totalprice"), stats, nFiles = 16)
    val preds = Seq(("o_custkey", lit(100L), lit(200L)))
    val (hDf, hScanned, hTotal) = StatsManifest.scanPruned(spark, hDir, preds)
    val (lDf, lScanned, _) = StatsManifest.scanPruned(spark, linDir, preds)
    assert(hScanned < hTotal, "hilbert layout must skip files on the second dimension")
    assert(hScanned < lScanned,
      s"hilbert ($hScanned files) should beat the linear layout ($lScanned files)")
    // skipping never changes the answer
    val want = orders.where(col("o_custkey").between(100L, 200L)).count()
    assert(hDf.count() === want && lDf.count() === want)
  }
}
