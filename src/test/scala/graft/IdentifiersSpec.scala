package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Identifiers._

class IdentifiersSpec extends AnyFunSuite with PropHelpers {

  // Reference behaviors (app/data.py:84-85)
  test("sqlify lowercases and collapses non-alnum runs to _") {
    assert(sqlify("My Sheet (2024)!") == "my_sheet_2024_")
    assert(sqlify("Sales--Q1") == "sales_q1")
    assert(sqlify("already_ok") == "already_ok") // NB: _ is non-alnum → stays single _
    assert(sqlify("A  B\t\tC") == "a_b_c")
    assert(sqlify("") == "")
    assert(sqlify("___") == "_")
  }

  test("to_alnum keeps alnum and underscore, preserves case (data.py:24-27)") {
    assert(toAlnum("Col Name #1") == "ColName1")
    assert(toAlnum("a_b-c.d") == "a_bcd")
    assert(toAlnum("") == "")
    assert(toAlnum("äöü") == "äöü") // Python isalnum is Unicode-aware
  }

  test("sqlify is idempotent") {
    forAllStrings { s => assert(sqlify(sqlify(s)) == sqlify(s)) }
  }

  test("sqlify output matches [a-z0-9_]*") {
    forAllStrings { s =>
      assert(sqlify(s).forall(c => c == '_' || c.isDigit || (c >= 'a' && c <= 'z')))
    }
  }

  test("toAlnum is idempotent and never grows") {
    forAllStrings { s =>
      val t = toAlnum(s)
      assert(toAlnum(t) == t)
      assert(t.length <= s.length)
    }
  }

  test("escape doubles single quotes (data.py:192)") {
    // covered at Column level by q_escape's oracle; pure sanity here
    assert("it's".replace("'", "''") == "it''s")
  }
}
