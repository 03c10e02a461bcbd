package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sync.{DropCreate, LoadReport, SyncAction, Truncate}

class SyncActionSpec extends AnyFunSuite with PropHelpers {

  // data.py:120-131 semantics
  test("same column set (case/order-insensitive) → Truncate") {
    assert(SyncAction.decide(Seq("a", "b"), Seq("B", "A")) == Truncate)
    assert(SyncAction.decide(Seq("x_1", "y"), Seq("Y", "X_1")) == Truncate)
  }

  test("incoming header is sanitized with to_alnum before compare") {
    // 'Col Name' → 'ColName' → lower 'colname'
    assert(SyncAction.decide(Seq("colname"), Seq("Col Name")) == Truncate)
    assert(SyncAction.decide(Seq("col name"), Seq("Col Name")) == DropCreate)
  }

  test("different sets → DropCreate") {
    assert(SyncAction.decide(Seq("a"), Seq("a", "b")) == DropCreate)
    assert(SyncAction.decide(Seq("a", "b"), Seq("a")) == DropCreate)
    assert(SyncAction.decide(Nil, Seq("a")) == DropCreate)
  }

  test("empty existing (new table) vs empty incoming") {
    assert(SyncAction.decide(Nil, Nil) == Truncate) // set-equal, as in reference
  }

  test("duplicate columns are multiset-compared (sorted lists, not sets)") {
    assert(SyncAction.decide(Seq("a", "a"), Seq("a")) == DropCreate)
    // the incoming side goes through the SAME uniquification the DDL
    // uses: a duplicate header maps to (a, a_1) — matching the table
    // our own CREATE produced (Truncate, grants preserved), and NOT a
    // raw duplicate-column table our DDL can never create
    assert(SyncAction.decide(Seq("a", "a_1"), Seq("A", "a")) == Truncate)
    assert(SyncAction.decide(Seq("a", "a"), Seq("A", "a")) == DropCreate)
  }

  test("Azure path forces DropCreate (data.py:179-186)") {
    assert(SyncAction.decide(Seq("a"), Seq("a"), forceDropCreate = true) == DropCreate)
  }

  test("property: decide is order-insensitive and ASCII-case-insensitive") {
    // ASCII-only: Unicode case-folding is not a round-trip (µ→Μ→μ), and
    // the reference's .lower() semantics are only stable within ASCII.
    val gen = org.scalacheck.Gen.listOf(
      org.scalacheck.Gen.stringOf(org.scalacheck.Gen.alphaNumChar))
    forAll(gen) { cols =>
      val shuffled = scala.util.Random.shuffle(cols)
      val existing = cols.map(graft.model.Identifiers.toAlnum)
      assert(SyncAction.decide(existing.map(_.toUpperCase), shuffled) ==
        SyncAction.decide(existing, cols))
    }
  }

  test("LoadReport renders reference strings with B4/B5 fixed") {
    assert(LoadReport(Some(Truncate), "x_excel.t", 5).render ==
      "Truncated and loaded into x_excel.t.\n5 records loaded successfully.\n")
    assert(LoadReport(Some(DropCreate), "x_excel.t", 0).render ==
      "Dropped and loaded into x_excel.t.\n0 records loaded successfully.\n")
    assert(LoadReport(None, "/tmp/t.csv", 3).render ==
      "Created /tmp/t.csv.\n3 records loaded successfully.\n")
  }
}
