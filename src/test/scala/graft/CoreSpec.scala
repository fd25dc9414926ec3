package graft

import graft.core._
import graft.sql.SqlTemplate
import org.scalatest.funsuite.AnyFunSuite

class CoreSpec extends AnyFunSuite {

  test("temp table naming parity: _tmp_ prefix, max length 62") {
    val t = TableRef.temp()
    assert(t.temp)
    assert(t.name.startsWith(TableRef.TempPrefix))
    assert(t.name.length == TableRef.MaxTableNameLength)
    assert(t.name.drop(TableRef.TempPrefix.length).forall(c => c >= 'a' && c <= 'z'))
  }

  test("a _tmp_-prefixed name is implicitly temp (table.py:230-235 parity)") {
    assert(TableRef("_tmp_foo").temp)
    assert(!TableRef("real_table").temp)
  }

  test("identifier quoting") {
    assert(SqlIdentifiers.quoteIfNeeded("orders") == "orders")
    assert(SqlIdentifiers.quoteIfNeeded("my$col") == "my$col")
    assert(SqlIdentifiers.quoteIfNeeded("bad-name") == "`bad-name`")
    assert(SqlIdentifiers.quoteIfNeeded("x`y") == "`x``y`")
    assert(SqlIdentifiers.quoteIfNeeded("1abc") == "`1abc`")
  }

  test("qualified names include schema") {
    assert(TableRef("t", Metadata(schema = Some("db"))).qualifiedName == "db.t")
  }

  test("sql literal escaping blocks injection") {
    assert(SqlIdentifiers.literal("o'brien") == "'o''brien'")
    assert(SqlIdentifiers.literal(42) == "42")
    assert(SqlIdentifiers.literal(null) == "NULL")
    assert(SqlIdentifiers.literal(Seq(1, 2)) == "(1, 2)")
  }

  test("sql literal escapes backslashes (Spark treats \\ as an escape)") {
    assert(SqlIdentifiers.literal("x\\") == "'x\\\\'")
    assert(SqlIdentifiers.literal("a\\'b") == "'a\\\\''b'")
    // the classic breakout payload stays inside the literal
    assert(SqlIdentifiers.literal("x\\' OR 1=1 --") == "'x\\\\'' OR 1=1 --'")
  }

  test(".xls routes to the BIFF8 path, not the OOXML parser") {
    assert(FileFormat.fromPath("/a/b/legacy.xls") == FileFormat.Xls)
    assert(FileFormat.fromPath("/a/b/modern.xlsx") == FileFormat.Xlsx)
  }

  test("template renders table refs and literals") {
    val sql = SqlTemplate.render(
      "SELECT * FROM {{t}} WHERE name = {{n}} AND k IN {{ks}}",
      Map("t" -> TableRef("orders"), "n" -> "a'b", "ks" -> Seq(1, 2, 3)))
    assert(sql == "SELECT * FROM orders WHERE name = 'a''b' AND k IN (1, 2, 3)")
  }

  test("unbound placeholder raises (StrictUndefined parity)") {
    intercept[IllegalArgumentException] {
      SqlTemplate.render("SELECT * FROM {{missing}}", Map.empty)
    }
  }

  test("file format inference from extension") {
    assert(FileFormat.fromPath("/a/b/data.csv") == FileFormat.Csv)
    assert(FileFormat.fromPath("/a/b/data.ndjson") == FileFormat.Ndjson)
    assert(FileFormat.fromPath("/a/b/data.parquet") == FileFormat.Parquet)
    assert(FileRef("/a/b/prefix_nosuffix").isPattern)
    assert(!FileRef("/a/b/x.csv").isPattern)
  }
}
