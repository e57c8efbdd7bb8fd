package graft.bank

import org.scalatest.funsuite.AnyFunSuite

/** The SQL double-entry must stay 1:1 with the Column rule set: same
  * rule names, same declaration order (ERROR_DESC joins messages in
  * declaration order, so a reorder would silently scramble the error
  * file the oracle recomputes). Predicate EQUIVALENCE is checked by
  * the DuckDB oracle itself on generated + broken frames. */
class BankRulesSqlSpec extends AnyFunSuite {

  test("SQL predicate list matches BankRules.all names and order") {
    assert(BankRulesSql.predicates.map(_._1) === BankRules.all.rules.map(_.name))
  }

  test("every rule has a message and every predicate is non-empty") {
    val msgs = BankRules.all.rules.map(r => r.name -> r.message).toMap
    BankRulesSql.predicates.foreach { case (n, p) =>
      assert(msgs(n).nonEmpty, s"$n has no message")
      assert(p.trim.nonEmpty, s"$n has an empty predicate")
    }
  }

  test("generated SQL parenthesizes every predicate (safe to OR-join)") {
    BankRulesSql.predicates.foreach { case (n, p) =>
      assert(p.startsWith("(") && p.endsWith(")"), s"$n: $p")
    }
  }
}
