package graft

import graft.tools.Cli
import org.scalatest.funsuite.AnyFunSuite

/** --pk grammar (extracted, testable — whitespace tolerance, composite
  * keys, every malformed shape rejected). */
class CliSpec extends AnyFunSuite {

  test("single and composite entries parse") {
    assert(Cli.parsePk("users=id") == Right(Map("users" -> Seq("id"))))
    assert(Cli.parsePk("lineitem=l_orderkey,l_linenumber") ==
      Right(Map("lineitem" -> Seq("l_orderkey", "l_linenumber"))))
    assert(Cli.parsePk("a=x;b=y,z") ==
      Right(Map("a" -> Seq("x"), "b" -> Seq("y", "z"))))
  }

  test("shell-natural whitespace is tolerated") {
    assert(Cli.parsePk("users=id; orders=o_orderkey") ==
      Right(Map("users" -> Seq("id"), "orders" -> Seq("o_orderkey"))))
    assert(Cli.parsePk(" users = id , region ") ==
      Right(Map("users" -> Seq("id", "region"))))
  }

  test("malformed entries rejected, not silently dropped") {
    assert(Cli.parsePk("users-id").isLeft)
    assert(Cli.parsePk("users=,").isLeft)   // empty column list
    assert(Cli.parsePk("=id").isLeft)       // empty table name
    assert(Cli.parsePk("users=id;broken").isLeft)
  }

  test("reference conflict rules: include/exclude and datadiff/snapshot") {
    import graft.tools.Cli
    assert(Cli.conflictError(Map("included-tables" -> "a", "excluded-tables" -> "b")).isDefined)
    assert(Cli.conflictError(Map("only-datadiff" -> "true", "only-snapshot" -> "true")).isDefined)
    assert(Cli.conflictError(Map("included-tables" -> "a", "only-snapshot" -> "true")).isEmpty)
  }

  test("empty segments from trailing semicolons are fine") {
    assert(Cli.parsePk("users=id;") == Right(Map("users" -> Seq("id"))))
  }
}
