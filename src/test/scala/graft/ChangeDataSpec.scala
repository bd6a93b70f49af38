package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ChangeData

class ChangeDataSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mergeApply covers all four MERGE cases") {
    val base = Seq(
      (1L, "A", 10.0), // untouched
      (2L, "B", 20.0), // updated (full payload)
      (3L, "C", 30.0), // updated (partial payload: null keeps base)
      (4L, "D", 40.0)  // deleted
    ).toDF("k", "seg", "bal")
    val changes = Seq(
      (2L, "upsert", Some("B2"), Some(21.0)),
      (3L, "upsert", Some("C2"), None),
      (4L, "delete", None, None),
      (9L, "upsert", Some("NEW"), Some(90.0)), // insert
      (8L, "delete", None, None)               // delete of a missing key: no-op
    ).toDF("k", "op", "seg", "bal")
    val out = ChangeData.mergeApply(base, changes, "k")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out === Seq(
      (1L, "A", 10.0), (2L, "B2", 21.0), (3L, "C2", 30.0), (9L, "NEW", 90.0)))
  }

  test("mergeApply evolves schema additively in both directions") {
    val base = Seq((1L, "A"), (2L, "B")).toDF("k", "seg")
    // the batch carries a NEW column `tier` and OMITS `seg`
    val changes = Seq(
      (2L, "upsert", "gold"),           // update: keeps seg from base, gains tier
      (9L, "upsert", "silver")          // insert: no base seg -> null
    ).toDF("k", "op", "tier")
    val out = ChangeData.mergeApply(base, changes, "k")
    assert(out.columns.toSeq === Seq("k", "seg", "tier"))
    val rows = out.orderBy("k")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), Option(r.getString(2)))).toSeq
    assert(rows === Seq(
      (1L, Some("A"), None),            // untouched base row: new column reads NULL
      (2L, Some("B"), Some("gold")),    // batch-omitted column retained from base
      (9L, None, Some("silver"))))      // insert: base-only column NULL
  }

  test("scd2Intervals collapses runs and emits contiguous, versioned intervals") {
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val log = Seq(
      // key 1: A A B A  -> three intervals (run-collapse keeps the A->B->A flips)
      (1L, "A", ts(1), 101L), (1L, "A", ts(2), 102L),
      (1L, "B", ts(3), 103L), (1L, "A", ts(4), 104L),
      // key 2: single state, two rows -> one open-ended interval
      (2L, "X", ts(1), 201L), (2L, "X", ts(9), 202L),
      // key 3: same-day flip ordered by the tie column
      (3L, "P", ts(5), 301L), (3L, "Q", ts(5), 302L)
    ).toDF("k", "attr", "ts", "tie")
    val out = ChangeData.scd2Intervals(log, "k", "attr", "ts", "tie")
      .orderBy("k", "version")
      .select("k", "attr", "valid_from", "valid_to", "version", "is_current")
      .collect()

    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getString(1)).toSeq === Seq("A", "B", "A"))
    assert(k1.map(_.getLong(4)).toSeq === Seq(1L, 2L, 3L))
    // intervals are contiguous: valid_to(v) == valid_from(v+1)
    k1.sliding(2).foreach { case Array(a, b) =>
      assert(a.getTimestamp(3) === b.getTimestamp(2))
    }
    // exactly one current row per key, and it is the last version
    Seq(1L, 2L, 3L).foreach { k =>
      val rows = out.filter(_.getLong(0) == k)
      assert(rows.count(_.getBoolean(5)) === 1)
      assert(rows.maxBy(_.getLong(4)).getBoolean(5))
      assert(rows.filter(_.getBoolean(5)).forall(r => r.get(3) == null))
    }
    val k3 = out.filter(_.getLong(0) == 3L)
    assert(k3.map(_.getString(1)).toSeq === Seq("P", "Q"), "tie column must order same-ts rows")
  }

  test("scd2Apply: incremental fold equals full recompute across every batch shape") {
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val before = Seq(
      (1L, "A", ts(1), 101L), (1L, "B", ts(3), 102L),  // will flip again in batch
      (2L, "X", ts(1), 201L),                          // batch CONTINUES the run
      (3L, "P", ts(2), 301L),                          // untouched by the batch
      (4L, "M", ts(1), 401L), (4L, "N", ts(2), 402L)   // touched, multi-version
    ).toDF("k", "attr", "ts", "tie")
    val batch = Seq(
      (1L, "A", ts(5), 103L),                 // reopens a prior attr: new version
      (2L, "X", ts(6), 202L),                 // same attr: collapses, closes nothing
      (4L, "M", ts(7), 403L), (4L, "M", ts(8), 404L), // flip + in-batch run
      (9L, "Z", ts(5), 901L)                  // key new to the table
    ).toDF("k", "attr", "ts", "tie")
    val hist = ChangeData.scd2Intervals(before, "k", "attr", "ts", "tie")
    val got = ChangeData.scd2Apply(hist, batch, "k", "attr", "ts", "tie")
    val want = ChangeData.scd2Intervals(before.unionByName(batch), "k", "attr", "ts", "tie")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // the continuing run really collapsed: key 2 still one open interval
    assert(got.where(col("k") === 2L).count() === 1)
    // versions continue, never restart: key 4 ends at version 3
    assert(got.where(col("k") === 4L).agg(max("version")).head().getLong(0) === 3L)
    // untouched key 3's row is byte-identical to its input history
    assert(got.where(col("k") === 3L).exceptAll(hist.where(col("k") === 3L)).isEmpty)
  }

  test("scd2AsOfJoin picks exactly the version valid at each probe; backdated probes keep NULL") {
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val log = Seq(
      (1L, "A", ts(2), 101L), (1L, "B", ts(5), 102L),
      (2L, "X", ts(3), 201L),
      // same-ts flip: zero-length interval must never double-match
      (3L, "P", ts(4), 301L), (3L, "Q", ts(4), 302L)
    ).toDF("k", "attr", "ts", "tie")
    val dim = ChangeData.scd2Intervals(log, "k", "attr", "ts", "tie")
    val facts = Seq(
      (10L, 1L, ts(2)),  // exactly at a boundary: the NEW version wins
      (11L, 1L, ts(4)),  // inside the first interval
      (12L, 1L, ts(9)),  // open interval
      (13L, 1L, ts(1)),  // before any version: NULL
      (14L, 3L, ts(4)),  // on the zero-length flip: exactly one match (Q)
      (15L, 7L, ts(4))   // key with no dimension at all: NULL
    ).toDF("fid", "k", "fts")
    val out = ChangeData.scd2AsOfJoin(facts, dim, "k", "fts")
      .select(col("fid"), col("attr")).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(10L -> "A", 11L -> "A", 12L -> "B", 13L -> null,
      14L -> "Q", 15L -> null))
    // 1:1: no probe multiplies
    assert(ChangeData.scd2AsOfJoin(facts, dim, "k", "fts").count() === facts.count())
  }

  test("enrichView maintenance: closed under dim and fact deltas, equals full recompute") {
    val fact = Seq((1L, 10L, 100.0), (2L, 20L, 200.0), (3L, 30L, 300.0))
      .toDF("fk", "jk", "price")
    val dim = Seq((10L, "A"), (20L, "B")).toDF("jk", "seg") // no 30 yet
    val v0 = ChangeData.enrichView(fact, dim, "jk")
    // dim batch: rewrite 10, DELETE 20, INSERT 30 (upgrades fact row 3,
    // which sat in the view with a NULL payload — the case that forces
    // the view to be LEFT OUTER)
    val dimDelta = Seq((10L, "upsert", "A2"), (20L, "delete", null.asInstanceOf[String]),
      (30L, "upsert", "C")).toDF("jk", "op", "seg")
    val v1 = ChangeData.enrichViewApplyDim(v0, dimDelta, "jk")
    val dim1 = ChangeData.mergeApply(dim, dimDelta, "jk")
    // fact batch: price rewrite on 1, delete 2, insert 4 pointing at the
    // DELETED dim key (must come back NULL-enriched)
    val factDelta = Seq((1L, "upsert", 10L, 111.0), (2L, "delete", 20L, 200.0),
      (4L, "upsert", 20L, 400.0)).toDF("fk", "op", "jk", "price")
    val v2 = ChangeData.enrichViewApplyFact(v1, factDelta, dim1, "fk", "jk")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(df.columns.indexOf("fk")), r.getLong(df.columns.indexOf("jk")),
        r.getDouble(df.columns.indexOf("price")),
        Option(r.getAs[String]("seg")))).toSet
    assert(rows(v2) === Set(
      (1L, 10L, 111.0, Some("A2")), // fact upsert re-enriched vs dim1
      (3L, 30L, 300.0, Some("C")),  // dim insert upgraded the null row
      (4L, 20L, 400.0, None)))      // new fact row vs deleted dim key
    // and the incremental path equals the full recompute over the
    // deltas-applied sources
    val factAfter = ChangeData.mergeApply(fact, factDelta, "fk")
    assert(rows(v2) === rows(ChangeData.enrichView(factAfter, dim1, "jk")))
  }

  test("incremental view: retractions, empty-group vanish, merge associativity") {
    val keys = Seq("k")
    val fact = Seq(("a", 10.0), ("a", 20.0), ("b", 5.0)).toDF("k", "v")
    val base = ChangeData.aggView(fact, keys, "v")

    // delete BOTH of a's rows (group must vanish), insert-and-retract
    // within one batch for c (must never appear), plain insert for d
    val batch = Seq(
      ("a", 10.0, "delete"), ("a", 20.0, "delete"),
      ("c", 7.0, "upsert"), ("c", 7.0, "delete"),
      ("d", 1.0, "upsert")
    ).toDF("k", "v", "op")
    val merged = ChangeData.presentView(
      ChangeData.mergeViews(base, ChangeData.aggDelta(batch, keys, "v"), keys), keys)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(merged.toSeq === Seq(("b", 1L, 5.0), ("d", 1L, 1.0)))

    // associativity: ((base + d1) + d2) == (base + (d1 + d2))
    val d1 = ChangeData.aggDelta(Seq(("b", 2.0, "upsert")).toDF("k", "v", "op"), keys, "v")
    val d2 = ChangeData.aggDelta(Seq(("b", 3.0, "upsert"), ("e", 4.0, "upsert")).toDF("k", "v", "op"), keys, "v")
    def render(df: org.apache.spark.sql.DataFrame) =
      ChangeData.presentView(df, keys).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val left = render(ChangeData.mergeViews(ChangeData.mergeViews(base, d1, keys), d2, keys))
    val right = render(ChangeData.mergeViews(base, ChangeData.mergeViews(d1, d2, keys), keys))
    assert(left === right)
    // and both equal the full recompute over fact + all inserts
    val full = render(ChangeData.aggView(
      fact.unionByName(Seq(("b", 2.0), ("b", 3.0), ("e", 4.0)).toDF("k", "v")), keys, "v"))
    assert(left === full)
  }
}
