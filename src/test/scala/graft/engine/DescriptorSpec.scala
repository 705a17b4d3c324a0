package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** F4/F5: descriptor-builder parity
  * (reference: src/sql/postgresql/mod.rs:587-638 + SURVEY §1.2). */
class DescriptorSpec extends AnyFunSuite {

  private def build(sql: String): TableDescriptor =
    SqlParser.parse(sql) match {
      case SqlParser.CreateTable(_, b, _) => b.build(1L)
      case other => fail(s"expected CreateTable, got $other")
    }

  test("F4 descriptor: ids, serial, nullable, varchar(40), PK storing columns, unique index") {
    val d = build(
      """CREATE TABLE IF NOT EXISTS example (
        |    id bigserial PRIMARY KEY,
        |    name varchar(40) NOT NULL,
        |    description varchar,
        |    CONSTRAINT unique_name UNIQUE(name)
        |)""".stripMargin)
    assert(d.columns.map(_.id) == Seq(1, 2, 3))
    val id = d.columns(0)
    assert(id.name == "id" && id.serial && !id.nullable && id.typeKind == ColumnTypeKind.Int64Kind)
    val name = d.columns(1)
    assert(name.name == "name" && !name.nullable && name.maxLength.contains(40))
    val descr = d.columns(2)
    assert(descr.name == "description" && descr.nullable && descr.maxLength.isEmpty)
    assert(d.indices.map(_.id) == Seq(1, 2))
    val pk = d.indices(0)
    assert(pk.kind == IndexKind.PrimaryKey && pk.columnIds == Seq(1) && pk.storingColumnIds == Seq(2, 3))
    val uq = d.indices(1)
    assert(uq.kind == IndexKind.UniqueNullsDistinct && uq.name == "unique_name" &&
      uq.columnIds == Seq(2) && uq.storingColumnIds.isEmpty)
  }

  test("F5 type matrix: accepted PG types map to the 8 kinds") {
    import ColumnTypeKind._
    val d = build(
      """CREATE TABLE t (
        | a boolean, b bool, c smallint, d int2, e int, f int4, g integer,
        | h bigint, i int8, j real, k float4, l double precision, m float8,
        | n text, o varchar, p varchar(7), q bytea, r smallserial, s serial2,
        | t serial, u serial4, v bigserial, w serial8,
        | PRIMARY KEY (a)
        |)""".stripMargin)
    val kinds = d.columns.map(c => c.name -> c.typeKind).toMap
    assert(kinds("a") == BooleanKind && kinds("b") == BooleanKind)
    assert(kinds("c") == Int16Kind && kinds("d") == Int16Kind)
    assert(Seq("e", "f", "g").forall(kinds(_) == Int32Kind))
    assert(kinds("h") == Int64Kind && kinds("i") == Int64Kind)
    assert(kinds("j") == Float32Kind && kinds("k") == Float32Kind)
    assert(kinds("l") == Float64Kind && kinds("m") == Float64Kind)
    assert(Seq("n", "o", "p").forall(kinds(_) == StringKind))
    assert(d.findColumn("p").get.maxLength.contains(7))
    assert(kinds("q") == BytesKind)
    assert(kinds("r") == Int16Kind && d.findColumn("r").get.serial)
    assert(kinds("t") == Int32Kind && d.findColumn("t").get.serial)
    assert(kinds("v") == Int64Kind && d.findColumn("v").get.serial)
    // serial implies not nullable
    assert(Seq("r", "s", "t", "u", "v", "w").forall(!d.findColumn(_).get.nullable))
  }

  test("F5 reject list: unsupported types and options error") {
    def rejects(sql: String, fragment: String): Unit = {
      val e = intercept[SqlError](build(sql))
      assert(e.getMessage.contains(fragment), s"message '${e.getMessage}' lacks '$fragment'")
    }
    rejects("CREATE TABLE t (a numeric, PRIMARY KEY(a))", "data type")
    rejects("CREATE TABLE t (a date, PRIMARY KEY(a))", "data type")
    rejects("CREATE TABLE t (a timestamp, PRIMARY KEY(a))", "data type")
    rejects("CREATE TABLE t (a json, PRIMARY KEY(a))", "data type")
    rejects("CREATE TABLE t (a uuid, PRIMARY KEY(a))", "data type")
    rejects("CREATE TABLE t (a int DEFAULT 3, PRIMARY KEY(a))", "DEFAULT")
    rejects("CREATE TABLE t (a int CHECK (a > 0), PRIMARY KEY(a))", "CHECK")
    rejects("CREATE TABLE t (a text COLLATE de, PRIMARY KEY(a))", "COLLATE")
    rejects("CREATE TABLE t (a int GENERATED ALWAYS AS (1), PRIMARY KEY(a))", "GENERATED")
    rejects("CREATE TABLE t (a int REFERENCES o(x), PRIMARY KEY(a))", "FOREIGN KEY")
    rejects("CREATE TABLE t (a varchar(MAX), PRIMARY KEY(a))", "varchar(MAX)")
    rejects("CREATE TABLE t (a varchar(10 characters), PRIMARY KEY(a))", "character length units")
    rejects("CREATE TABLE t (a int, b int, FOREIGN KEY (b) REFERENCES o(x), PRIMARY KEY(a))", "FOREIGN KEY")
    rejects("CREATE TABLE t (a int, CHECK (a > 0), PRIMARY KEY(a))", "CHECK")
  }

  test("structural rules: PK mandatory, single PK, dup columns, unknown index column") {
    assert(intercept[SqlError](build("CREATE TABLE t (a int)")).getMessage.contains("no primary index"))
    assert(intercept[SqlError](
      build("CREATE TABLE t (a int PRIMARY KEY, b int PRIMARY KEY)")).getMessage.contains("multiple primary"))
    assert(intercept[SqlError](
      build("CREATE TABLE t (a int, a text, PRIMARY KEY(a))")).getMessage.contains("multiple columns named"))
    assert(intercept[SqlError](
      build("CREATE TABLE t (a int, PRIMARY KEY(zzz))")).getMessage.contains("no column"))
  }

  test("statement-level rejects: parity with SURVEY §2.C") {
    def rejects(sql: String, fragment: String): Unit = {
      val e = intercept[SqlError](SqlParser.parse(sql))
      assert(e.getMessage.contains(fragment), s"message '${e.getMessage}' lacks '$fragment'")
    }
    rejects("CREATE OR REPLACE TABLE t (a int PRIMARY KEY)", "CREATE OR REPLACE")
    rejects("CREATE TEMP TABLE t (a int PRIMARY KEY)", "TEMPORARY")
    rejects("CREATE EXTERNAL TABLE t (a int PRIMARY KEY)", "EXTERNAL")
    rejects("CREATE VIEW v AS SELECT 1", "CREATE VIEW")
    rejects("CREATE INDEX i ON t (a)", "CREATE INDEX")
    rejects("CREATE FUNCTION f() RETURNS int", "CREATE FUNCTION")
    rejects("DROP VIEW v", "DROP VIEW")
    rejects("DROP SCHEMA s", "DROP SCHEMA")
    rejects("DROP DATABASE d", "DROP DATABASE")
    rejects("UPDATE t SET a = 1", "UPDATE")
    rejects("DELETE FROM t", "DELETE")
    rejects("SELECT 1; SELECT 2", "multiple statements")
    rejects("  ", "no statement")
  }

  test("descriptor JSON round-trip") {
    val d = build(
      "CREATE TABLE t (id serial PRIMARY KEY, name varchar(12), v bytea, " +
        "CONSTRAINT u UNIQUE NULLS NOT DISTINCT (name, v))")
    val back = DescriptorJson.read(DescriptorJson.write(d))
    assert(back == d)
    assert(back.indices(1).kind == IndexKind.UniqueNullsNotDistinct)
  }
}
