package graft.operators

import java.nio.file.Files
import graft.Tables
import graft.engine.{Catalog, SqlContext, SqlEngine}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SURVEY §2.A operators (the reference's own code) driven end-to-end
  * through the driver's oracle gate: catalog DDL (A3-A6), the insert
  * pipeline incl. serial/constraints (A2), table scan (A1), and session
  * UDFs (A7). Each query stands up a throwaway warehouse, pushes testdata
  * through the PG statement engine, and reads it back — the DuckDB oracle
  * sees only the equivalent relational result.
  */
object Parity {

  private def engine(s: SparkSession, db: String): SqlEngine = {
    val wh = Files.createTempDirectory("graft-parity-wh-").toString
    val e = new SqlEngine(s, new Catalog(wh), SqlContext(db, "user1"))
    e.execute(s"CREATE DATABASE $db")
    e
  }

  val queries: Seq[NamedQuery] = Seq(
    // A1+A2+A3+A4: create table, INSERT .. SELECT from parquet, scan back.
    // The oracle is the identity query on the source — a hash match proves
    // the engine's insert+scan round-trip is lossless.
    NamedQuery(
      "a01_engine_roundtrip",
      Some(
        "SELECT l_orderkey AS orderkey, l_linenumber AS linenumber, l_quantity AS quantity, " +
          "l_returnflag AS returnflag FROM lineitem " +
          "ORDER BY orderkey, linenumber, quantity, returnflag"),
      (s, dir) => {
        Tables.registerAll(s, dir)
        val e = engine(s, "g1")
        // the synthetic lineitem has duplicate (orderkey, linenumber) pairs,
        // so the row identity is a bigserial surrogate key
        e.execute(
          "CREATE TABLE li (id bigserial PRIMARY KEY, orderkey bigint, linenumber int, " +
            "quantity double precision, returnflag text)")
        e.execute(
          "INSERT INTO li (orderkey, linenumber, quantity, returnflag) " +
            "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem")
        e.execute(
          "SELECT orderkey, linenumber, quantity, returnflag FROM li " +
            "ORDER BY orderkey, linenumber, quantity, returnflag")
      }),

    // A2 serial prefill: ids 1..n assigned in input order over a sorted
    // select — the oracle reproduces them with row_number().
    NamedQuery(
      "a02_engine_serial",
      Some(
        "SELECT CAST(row_number() OVER (ORDER BY n_nationkey) AS INT) AS id, n_name AS name " +
          "FROM nation ORDER BY id"),
      (s, dir) => {
        Tables.registerAll(s, dir)
        val e = engine(s, "g2")
        e.execute("CREATE TABLE nations (id serial PRIMARY KEY, name text)")
        e.execute("INSERT INTO nations (name) SELECT n_name FROM nation ORDER BY n_nationkey")
        e.execute("SELECT id, name FROM nations ORDER BY id")
      }),

    // A7 session UDFs bound to connection context, including the aliases
    // current_role/session_user/bare `user` and nested-expression use
    // (reference: src/sql/postgresql/functions/mod.rs:31-193, alias list
    // at mod.rs:125).
    NamedQuery(
      "a07_session_udfs",
      Some(
        "SELECT 'g3' AS current_catalog, 'g3' AS database, 'public' AS current_schema, " +
          "0 AS inet_client_port, 'user1' AS current_user, 'user1' AS current_role, " +
          "'user1' AS \"user\", 'USER1' AS shouted_user"),
      (s, dir) => {
        val e = engine(s, "g3")
        e.execute(
          "SELECT current_catalog, current_database() AS database, current_schema(), " +
            "inet_client_port(), current_user, current_role, user, " +
            "upper(session_user) AS shouted_user")
      })
  )
}
