package graft.engine

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the descriptor model, PG type mapping, and
  * tokenizer (SURVEY §5: property tests for the type mapping and
  * constraint surface). Run through scalacheck's own runner and asserted
  * under ScalaTest. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, name: String): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: $res")
  }

  // --- generators -------------------------------------------------------

  private val typeSynonyms: Map[String, ColumnTypeKind] = {
    import ColumnTypeKind._
    Map(
      "boolean" -> BooleanKind, "bool" -> BooleanKind,
      "smallint" -> Int16Kind, "int2" -> Int16Kind,
      "int" -> Int32Kind, "int4" -> Int32Kind, "integer" -> Int32Kind,
      "bigint" -> Int64Kind, "int8" -> Int64Kind,
      "real" -> Float32Kind, "float4" -> Float32Kind,
      "double precision" -> Float64Kind, "float8" -> Float64Kind,
      "text" -> StringKind, "varchar" -> StringKind, "bytea" -> BytesKind,
      "smallserial" -> Int16Kind, "serial2" -> Int16Kind,
      "serial" -> Int32Kind, "serial4" -> Int32Kind,
      "bigserial" -> Int64Kind, "serial8" -> Int64Kind)
  }
  private val serialNames =
    Set("smallserial", "serial2", "serial", "serial4", "bigserial", "serial8")

  private val genIdent: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(5, Gen.oneOf(Gen.alphaLowerChar, Gen.numChar))
  } yield (h :: t).mkString

  private def randomizeCase(s: String): Gen[String] =
    Gen.listOfN(s.length, Gen.oneOf(true, false)).map { flips =>
      s.zip(flips).map { case (c, up) => if (up) c.toUpper else c }.mkString
    }

  // --- properties -------------------------------------------------------

  test("PG type mapping holds under arbitrary keyword casing") {
    val p = Prop.forAll(
      Gen.oneOf(typeSynonyms.keys.toSeq).flatMap(t => randomizeCase(t).map(rc => (t, rc))),
      genIdent) { case ((typeName, cased), colName) =>
      val ddl = s"CREATE TABLE t ($colName $cased, k int, PRIMARY KEY (k))"
      SqlParser.parse(ddl) match {
        case SqlParser.CreateTable(_, b, _) =>
          val d = b.build(1L)
          val c = d.findColumn(colName).get
          c.typeKind == typeSynonyms(typeName) &&
            c.serial == serialNames.contains(typeName) &&
            (!c.serial || !c.nullable)
        case _ => false
      }
    }
    check(p, "type mapping")
  }

  test("descriptor JSON round-trips for arbitrary schemas") {
    val genColumn = for {
      name <- genIdent
      tn <- Gen.oneOf(typeSynonyms.keys.toSeq)
      notNull <- Gen.oneOf(true, false)
      varcharLen <- Gen.choose(1, 255)
    } yield (name, tn, notNull, varcharLen)

    val p = Prop.forAll(Gen.listOfN(6, genColumn), Gen.choose(1, 5)) { (colsRaw, nUnique) =>
      val cols = colsRaw.distinctBy(_._1)
      cols.size >= 2 ==> {
        val b = new TableDescriptorBuilder("t")
        cols.foreach { case (name, tn, notNull, len) =>
          val kind = typeSynonyms(tn)
          val maxLen = if (tn == "varchar") Some(len) else None
          b.addColumn(name, kind, maxLen)
          if (notNull) b.setNullable(false)
          b.setSerial(serialNames.contains(tn))
        }
        b.addPrimaryIndex(None, Seq(cols.head._1))
        cols.tail.take(nUnique).zipWithIndex.foreach { case ((name, _, _, _), i) =>
          b.addUniqueIndex(Some(s"u$i"), Seq(name), nullsDistinct = i % 2 == 0)
        }
        val d = b.build(7L)
        val back = DescriptorJson.read(DescriptorJson.write(d))
        back == d &&
          d.primaryIndex.storingColumnIds == d.columns.map(_.id).filterNot(d.primaryIndex.columnIds.contains)
      }
    }
    check(p, "descriptor json")
  }

  test("tokenizer is stable under re-rendering (session-function rewrite)") {
    // a rewrite with no session tokens must preserve the token stream
    val genTok: Gen[String] = Gen.oneOf(
      genIdent, Gen.choose(0, 99999).map(_.toString),
      Gen.const("'it''s'"), Gen.const("\"Quoted Id\""),
      Gen.oneOf("select", "from", "where", "and", "(", ")", ",", "=", "<=", "<>", "||", "*", "."))
    val p = Prop.forAll(Gen.listOfN(12, genTok)) { toks =>
      val sql = toks.mkString(" ")
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
      val eng = new SqlEngine(
        spark, new Catalog(java.nio.file.Files.createTempDirectory("p-wh").toString),
        SqlContext("db1", "u"))
      val once = eng.rewriteSessionFunctions(sql)
      val twice = eng.rewriteSessionFunctions(once)
      SqlParser.tokenize(once) == SqlParser.tokenize(sql) &&
        SqlParser.tokenize(twice) == SqlParser.tokenize(once)
    }
    check(p, "tokenizer stability")
  }

  test("statement splitting is comment-blind: interleaved comments never change the token stream") {
    val genStmtTok: Gen[String] = Gen.oneOf(
      genIdent, Gen.choose(0, 9999).map(_.toString),
      Gen.const("'a; ''b'''"), Gen.oneOf("select", "from", "where", ",", "(", ")", "="))
    val genComment: Gen[String] = Gen.oneOf(
      Gen.const(""), Gen.const("-- note; with semicolon\n"),
      Gen.const("/* block; ; comment */"))
    val p = Prop.forAll(Gen.listOfN(8, Gen.zip(genStmtTok, genComment))) { pairs =>
      val plain = pairs.map(_._1).mkString(" ")
      val commented = pairs.map { case (t, c) => s"$t $c" }.mkString(" ") + " -- trailing; junk"
      SqlParser.tokenize(SqlParser.singleStatement(commented)) ==
        SqlParser.tokenize(SqlParser.singleStatement(plain))
    }
    check(p, "comment-blind splitting")
  }

  test("resolveTables is byte-identity on statements referencing no catalog table") {
    // the resolver splices the ORIGINAL text around resolutions; with no
    // resolvable reference it must return the input verbatim — whitespace,
    // comments, casing, dotted alias chains and all
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    val eng = new SqlEngine(
      spark, new Catalog(java.nio.file.Files.createTempDirectory("p-resolve").toString),
      SqlContext("db1", "u"))
    eng.execute("CREATE DATABASE db1")
    eng.execute("CREATE TABLE ztable99x (a int PRIMARY KEY)") // 9 chars — never generated
    val genTok: Gen[String] = Gen.oneOf(
      genIdent, Gen.choose(0, 99999).map(_.toString),
      Gen.const("'str; lit'"), Gen.const("-- cmt\n"), Gen.const("/* c */"),
      Gen.oneOf("select", "from", "where", "join", "on", "(", ")", ",", ".", "=", "*"))
    val p = Prop.forAll(Gen.listOfN(14, genTok)) { toks =>
      val sql = toks.mkString(" ")
      val (rewritten, refs, infoSchema) = eng.resolveTables(sql)
      rewritten == sql && refs.isEmpty && !infoSchema
    }
    check(p, "resolveTables identity")
  }

  test("narrowing guard: bigint into int raises exactly when the value can't round-trip") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    val eng = new SqlEngine(
      spark, new Catalog(java.nio.file.Files.createTempDirectory("p-narrow").toString),
      SqlContext("db1", "u"))
    eng.execute("CREATE DATABASE db1")
    eng.execute("CREATE TABLE t (id bigserial PRIMARY KEY, v int)")
    val interesting = Seq(0L, 1L, -1L, Int.MaxValue.toLong, Int.MinValue.toLong,
      Int.MaxValue + 1L, Int.MinValue - 1L, Long.MaxValue, Long.MinValue)
    val p = Prop.forAll(Gen.oneOf(Gen.oneOf(interesting), Gen.choose(Long.MinValue, Long.MaxValue))) { v =>
      val fits = v >= Int.MinValue && v <= Int.MaxValue
      try {
        eng.execute(s"INSERT INTO t (v) VALUES (CAST($v AS BIGINT))")
        fits
      } catch {
        case e: SqlError => !fits && e.kind == SqlError.MismatchColumnType
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(res.passed, s"narrowing guard: $res")
  }

  test("serial counter arithmetic never exceeds the type ceiling") {
    val wh = java.nio.file.Files.createTempDirectory("p-serial").toString
    val cat = new Catalog(wh)
    cat.createDatabase("d", ifNotExists = false)
    val b = new TableDescriptorBuilder("t")
    b.addColumn("id", ColumnTypeKind.Int16Kind, None).setSerial(true)
    b.addPrimaryIndex(None, Seq("id"))
    cat.createTable("d", "public", b, ifNotExists = false)
    val col16 = cat.getTable("d", "public", "t").findColumn("id").get
    val p = Prop.forAll(Gen.choose(0L, Short.MaxValue + 10L), Gen.choose(1L, 64L)) { (start, n) =>
      cat.setSerial("d", "public", "t", col16.id, start)
      val wouldOverflow = start + n > Short.MaxValue
      try {
        val first = cat.reserveSerial("d", "public", "t", col16, n)
        !wouldOverflow && first == start + 1 &&
          cat.peekSerial("d", "public", "t", col16.id) == start + n
      } catch {
        case e: SqlError => wouldOverflow && e.getMessage.contains("overflow")
      }
    }
    check(p, "serial ceiling")
  }
}
