package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A named query with an optional DuckDB oracle.
  *
  * Conventions that keep the driver's hash-compare honest:
  *   - every output column is explicitly aliased, identically in the Spark
  *     plan and in the oracle SQL;
  *   - every floating-point aggregate is `round()`ed the same on both sides
  *     (raw column values pass through un-rounded — they are bit-identical);
  *   - every query ends in a total ORDER BY with explicit NULLS FIRST/LAST
  *     (Spark and DuckDB have different default null ordering);
  *   - integer-width functions (length, floor, year, %, ...) are cast to
  *     BIGINT on both sides (Spark returns int where DuckDB returns int64).
  */
final case class NamedQuery(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

/** The relational operator inventory of SURVEY.md §2.B re-expressed
  * Spark-first: scan/project/filter, all join types, hash aggregation,
  * rollup/cube/grouping sets, windows, sort/limit/top-k, set ops, scalar
  * function families, and subqueries (IN / EXISTS / scalar).
  *
  * The reference delegates all of these to DataFusion wholesale
  * (reference: src/sql/mod.rs:84,136-137); here they are declared with the
  * DataFrame API (or `spark.sql` for subquery forms) so Catalyst plans
  * them: predicate pushdown and column pruning reach the parquet scans,
  * small dimension tables are broadcast, and aggregates run
  * partial-then-final — all properties the reference's single-partition
  * scan (src/sql/plan/table.rs:214) lacks.
  */
object Relational {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  import OracleRound.{stableRound, stableRoundSql}

  /** For subquery shapes the DataFrame API can't express directly, run the
    * exact oracle text through spark.sql — same string, two engines. */
  private def viaSql(sql: String): NamedQueryBuilder = new NamedQueryBuilder(sql)
  final class NamedQueryBuilder(sql: String) {
    def named(name: String): NamedQuery =
      NamedQuery(name, Some(sql), (s, dir) => { Tables.registerAll(s, dir); s.sql(sql) })
  }

  val queries: Seq[NamedQuery] = Seq(
    // --- aggregation: TPC-H Q1 pricing summary (partial+final hash agg) ---
    NamedQuery(
      "q01_pricing_summary",
      Some(
        "SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty, " +
          "round(sum(l_extendedprice),2) AS sum_base_price, " +
          "round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price, " +
          "round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge, " +
          stableRoundSql("avg(l_quantity)", 4) + " AS avg_qty, " +
          stableRoundSql("avg(l_extendedprice)", 4) + " AS avg_price, " +
          stableRoundSql("avg(l_discount)", 4) + " AS avg_disc, count(*) AS count_order " +
          "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01' " +
          "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-01"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
            stableRound(avg(col("l_quantity")), 4).as("avg_qty"),
            stableRound(avg(col("l_extendedprice")), 4).as("avg_price"),
            stableRound(avg(col("l_discount")), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // --- scan + filter + projection with CASE/BETWEEN/IN/LIKE ---
    NamedQuery(
      "q02_filter_expr",
      Some(
        "SELECT p_partkey, p_name, CASE WHEN p_type='PROMO' THEN 'promo' WHEN p_type='ECONOMY' THEN 'econ' ELSE 'std' END AS kind, p_retailprice " +
          "FROM part WHERE p_size BETWEEN 10 AND 30 AND p_brand IN ('Brand#1','Brand#2','Brand#3') AND p_name LIKE '%wid%' " +
          "ORDER BY p_partkey"),
      (s, dir) =>
        t(s, dir, "part")
          .filter(
            col("p_size").between(10, 30) &&
              col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
              col("p_name").like("%wid%"))
          .select(
            col("p_partkey"),
            col("p_name"),
            when(col("p_type") === "PROMO", "promo")
              .when(col("p_type") === "ECONOMY", "econ")
              .otherwise("std").as("kind"),
            col("p_retailprice"))
          .orderBy(col("p_partkey"))),

    // --- 3-way join with broadcast dimension + top-k (TPC-H Q3 shape) ---
    NamedQuery(
      "q03_top_orders",
      Some(
        "SELECT o_orderkey, o_orderdate, round(sum(l_extendedprice*(1-l_discount)),4) AS revenue " +
          "FROM lineitem JOIN orders ON l_orderkey=o_orderkey JOIN customer ON o_custkey=c_custkey " +
          "WHERE c_mktsegment='BUILDING' GROUP BY o_orderkey, o_orderdate " +
          "ORDER BY revenue DESC, o_orderkey LIMIT 10"),
      (s, dir) => {
        // pre-aggregate revenue per order BEFORE the fact-fact join: the
        // per-order sums are complete either way (the customer filter
        // only selects which orders survive), and the dominant exchange
        // then carries one aggregated row per order instead of every
        // lineitem row
        val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val rev = t(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
        t(s, dir, "orders")
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(rev, col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderkey"), col("o_orderdate"), round(col("rev"), 4).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      }),

    // --- left outer join + null-aware aggregation ---
    NamedQuery(
      "q04_left_join_agg",
      Some(
        "SELECT c_custkey, count(o_orderkey) AS n_big, round(coalesce(sum(o_totalprice),0),2) AS sum_big " +
          "FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o ON c_custkey = o_custkey " +
          "GROUP BY c_custkey ORDER BY c_custkey"),
      (s, dir) =>
        t(s, dir, "customer")
          .join(
            t(s, dir, "orders").filter(col("o_totalprice") > 400000),
            col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(
            count(col("o_orderkey")).as("n_big"),
            round(coalesce(sum(col("o_totalprice")), lit(0)), 2).as("sum_big"))
          .orderBy(col("c_custkey"))),

    // --- left semi join (EXISTS) ---
    NamedQuery(
      "q05_semi_join",
      Some(
        "SELECT c_custkey, c_name FROM customer WHERE c_custkey IN " +
          "(SELECT o_custkey FROM orders WHERE o_orderpriority='1-URGENT') ORDER BY c_custkey"),
      (s, dir) =>
        t(s, dir, "customer")
          .join(
            t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))),

    // --- left anti join (NOT EXISTS) ---
    NamedQuery(
      "q06_anti_join",
      Some(
        "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
          "(SELECT 1 FROM orders WHERE o_custkey=c_custkey AND o_totalprice>450000) ORDER BY c_custkey"),
      (s, dir) =>
        t(s, dir, "customer")
          .join(
            t(s, dir, "orders").filter(col("o_totalprice") > 450000),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))),

    // --- full outer join of two aggregated sides ---
    NamedQuery(
      "q07_full_outer",
      Some(
        "SELECT CAST(coalesce(s.k, c.k) AS BIGINT) AS nationkey, n_supp, n_cust FROM " +
          "(SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY s_nationkey) s " +
          "FULL OUTER JOIN " +
          "(SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY c_nationkey) c " +
          "ON s.k = c.k ORDER BY nationkey"),
      (s, dir) => {
        val sup = t(s, dir, "supplier").groupBy(col("s_nationkey").as("sk"))
          .agg(count(lit(1)).as("n_supp"))
        val cus = t(s, dir, "customer").groupBy(col("c_nationkey").as("ck"))
          .agg(count(lit(1)).as("n_cust"))
        sup.join(cus, col("sk") === col("ck"), "full_outer")
          .select(
            coalesce(col("sk"), col("ck")).cast("bigint").as("nationkey"),
            col("n_supp"), col("n_cust"))
          .orderBy(col("nationkey"))
      }),

    // --- cross join ---
    NamedQuery(
      "q08_cross_join",
      Some("SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name"),
      (s, dir) =>
        t(s, dir, "region").select(col("r_name"))
          .crossJoin(t(s, dir, "nation").select(col("n_name")))
          .orderBy(col("r_name"), col("n_name"))),

    // --- window: row_number + lag over per-key ordering ---
    NamedQuery(
      "q09_window_rank",
      Some(
        "SELECT o_custkey, rn, o_orderkey, o_totalprice, prev_price FROM " +
          "(SELECT o_custkey, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn, " +
          "o_orderkey, o_totalprice, lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS prev_price " +
          "FROM orders) t WHERE rn <= 2 ORDER BY o_custkey, rn"),
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .select(
            col("o_custkey"),
            row_number().over(w).as("rn"),
            col("o_orderkey"), col("o_totalprice"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"))
          .filter(col("rn") <= 2)
          .orderBy(col("o_custkey"), col("rn"))
      }),

    // --- window: running sum + sliding average frames ---
    NamedQuery(
      "q10_window_running",
      Some(
        "SELECT user_id, event_id, " +
          "round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running, " +
          stableRoundSql("avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)", 4) + " AS mov_avg " +
          "FROM events WHERE user_id < 25 ORDER BY user_id, event_id"),
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .filter(col("user_id") < 25)
          .select(
            col("user_id"), col("event_id"),
            round(sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running"),
            stableRound(avg(col("value")).over(w.rowsBetween(-3, Window.currentRow)), 4).as("mov_avg"))
          .orderBy(col("user_id"), col("event_id"))
      }),

    // --- global top-k (TakeOrderedAndProject) ---
    NamedQuery(
      "q11_topk",
      Some(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
          "ORDER BY o_totalprice DESC, o_orderkey LIMIT 15"),
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(15)),

    // --- set operations: INTERSECT / EXCEPT / UNION ALL ---
    NamedQuery(
      "q12_setops",
      Some(
        "SELECT 'both' AS tag, k FROM (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus='F' " +
          "INTERSECT SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus='O') a " +
          "UNION ALL " +
          "SELECT 'f_only' AS tag, k FROM (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus='F' " +
          "EXCEPT SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus='O') b " +
          "ORDER BY tag, k"),
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val f = orders.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k")).distinct()
        val o = orders.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("k")).distinct()
        f.intersect(o).select(lit("both").as("tag"), col("k"))
          .unionByName(f.except(o).select(lit("f_only").as("tag"), col("k")))
          .orderBy(col("tag"), col("k"))
      }),

    // --- ROLLUP ---
    NamedQuery(
      "q13_rollup",
      Some(
        "SELECT n_name, count(*) AS n_orders, round(sum(o_totalprice),2) AS total " +
          "FROM orders JOIN customer ON o_custkey=c_custkey JOIN nation ON c_nationkey=n_nationkey " +
          "GROUP BY ROLLUP(n_name) ORDER BY n_name ASC NULLS FIRST"),
      (s, dir) =>
        t(s, dir, "orders")
          .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .rollup(col("n_name"))
          .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
          .orderBy(col("n_name").asc_nulls_first)),

    // --- CUBE ---
    NamedQuery(
      "q14_cube",
      Some(
        "SELECT o_orderstatus AS status, o_orderpriority AS priority, count(*) AS n " +
          "FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) " +
          "ORDER BY status ASC NULLS FIRST, priority ASC NULLS FIRST"),
      (s, dir) =>
        t(s, dir, "orders")
          .cube(col("o_orderstatus").as("status"), col("o_orderpriority").as("priority"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("status").asc_nulls_first, col("priority").asc_nulls_first)),

    // --- GROUPING SETS (same SQL text runs on both engines) ---
    viaSql(
      "SELECT o_orderstatus AS status, o_orderpriority AS priority, count(*) AS n, round(sum(o_totalprice),2) AS total " +
        "FROM orders GROUP BY GROUPING SETS ((o_orderstatus),(o_orderpriority),()) " +
        "ORDER BY status ASC NULLS FIRST, priority ASC NULLS FIRST").named("q15_grouping_sets"),

    // --- DISTINCT aggregates ---
    NamedQuery(
      "q16_distinct_agg",
      Some(
        "SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp, count(DISTINCT l_partkey) AS n_part, " +
          "count(*) AS n_rows FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(col("l_partkey")).as("n_part"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag"))),

    // --- string function family ---
    NamedQuery(
      "q17_string_funcs",
      Some(
        "SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo, substr(p_name,1,5) AS pre, " +
          "CAST(length(p_name) AS BIGINT) AS len, replace(p_name,' ','_') AS und, " +
          "concat(p_brand, ':', p_type) AS br, CAST(strpos(p_name,'o') AS BIGINT) AS pos, " +
          "lpad(p_brand, 12, '*') AS pad, reverse(p_name) AS rev " +
          "FROM part WHERE p_partkey < 200 ORDER BY p_partkey"),
      (s, dir) =>
        t(s, dir, "part")
          .filter(col("p_partkey") < 200)
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("up"),
            lower(col("p_brand")).as("lo"),
            substring(col("p_name"), 1, 5).as("pre"),
            length(col("p_name")).cast("bigint").as("len"),
            regexp_replace(col("p_name"), " ", "_").as("und"),
            concat(col("p_brand"), lit(":"), col("p_type")).as("br"),
            instr(col("p_name"), "o").cast("bigint").as("pos"),
            lpad(col("p_brand"), 12, "*").as("pad"),
            reverse(col("p_name")).as("rev"))
          .orderBy(col("p_partkey"))),

    // --- regex family ---
    NamedQuery(
      "q18_regex",
      Some(
        "SELECT p_partkey, CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS BIGINT) AS brand_num, " +
          "regexp_replace(p_name, '[aeiou]', '', 'g') AS devowel " +
          "FROM part WHERE regexp_matches(p_name, '^[a-f]') ORDER BY p_partkey"),
      (s, dir) =>
        t(s, dir, "part")
          .filter(col("p_name").rlike("^[a-f]"))
          .select(
            col("p_partkey"),
            regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("bigint").as("brand_num"),
            regexp_replace(col("p_name"), "[aeiou]", "").as("devowel"))
          .orderBy(col("p_partkey"))),

    // --- math function family ---
    NamedQuery(
      "q19_math_funcs",
      Some(
        "SELECT l_orderkey, l_linenumber, round(sqrt(l_extendedprice),4) AS sq, " +
          "round(ln(l_extendedprice),6) AS lnp, round(power(l_discount+1,3),6) AS pw, " +
          "CAST(floor(l_extendedprice) AS BIGINT) AS fl, CAST(ceil(l_extendedprice) AS BIGINT) AS ce, " +
          "abs(l_quantity - 25) AS ab, CAST(l_linenumber % 3 AS BIGINT) AS md, " +
          "greatest(l_tax, l_discount) AS gr, least(l_tax, l_discount) AS ls " +
          "FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber"),
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_orderkey") < 100)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            round(sqrt(col("l_extendedprice")), 4).as("sq"),
            round(log(col("l_extendedprice")), 6).as("lnp"),
            round(pow(col("l_discount") + 1, 3), 6).as("pw"),
            floor(col("l_extendedprice")).cast("bigint").as("fl"),
            ceil(col("l_extendedprice")).cast("bigint").as("ce"),
            abs(col("l_quantity") - 25).as("ab"),
            (col("l_linenumber") % 3).cast("bigint").as("md"),
            greatest(col("l_tax"), col("l_discount")).as("gr"),
            least(col("l_tax"), col("l_discount")).as("ls"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // --- date/time extraction + aggregation ---
    NamedQuery(
      "q20_datetime",
      Some(
        "SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, CAST(month(o_orderdate) AS BIGINT) AS o_month, " +
          "count(*) AS n, round(sum(o_totalprice),2) AS total " +
          "FROM orders GROUP BY 1, 2 ORDER BY o_year, o_month"),
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(
            year(col("o_orderdate")).cast("bigint").as("o_year"),
            month(col("o_orderdate")).cast("bigint").as("o_month"))
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
          .orderBy(col("o_year"), col("o_month"))),

    // --- HAVING ---
    NamedQuery(
      "q21_having",
      Some(
        "SELECT o_custkey, count(*) AS n, round(sum(o_totalprice),2) AS total FROM orders " +
          "GROUP BY o_custkey HAVING count(*) >= 14 AND sum(o_totalprice) > 3000000 ORDER BY o_custkey"),
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"),
            sum(col("o_totalprice")).as("raw_total"))
          .filter(col("n") >= 14 && col("raw_total") > 3000000)
          .drop("raw_total")
          .orderBy(col("o_custkey"))),

    // --- uncorrelated IN subquery ---
    viaSql(
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_custkey IN " +
        "(SELECT c_custkey FROM customer WHERE c_acctbal > 9000) ORDER BY o_orderkey").named("q22_subquery_in"),

    // --- scalar subquery ---
    viaSql(
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 1.9 * " +
        "(SELECT avg(o_totalprice) FROM orders) ORDER BY o_orderkey").named("q23_subquery_scalar"),

    // --- correlated EXISTS subquery ---
    viaSql(
      "SELECT o_orderkey, o_orderstatus FROM orders o WHERE EXISTS " +
        "(SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49) " +
        "ORDER BY o_orderkey").named("q24_exists_correlated"),

    // --- conditional aggregation ratio (TPC-H Q14 shape) ---
    NamedQuery(
      "q25_case_promo",
      Some(
        "SELECT " + stableRoundSql(
          "100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1-l_discount) ELSE 0 END) " +
            "/ sum(l_extendedprice*(1-l_discount))", 4) + " AS promo_revenue " +
          "FROM lineitem JOIN part ON l_partkey = p_partkey " +
          "WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'"),
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1997-04-01"))
          .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
          .agg(
            stableRound(
              lit(100.0) *
                sum(when(col("p_type") === "PROMO", col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0)) /
                sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("promo_revenue"))),

    // --- exact interpolated percentiles (DuckDB quantile_cont) ---
    NamedQuery(
      "q26_percentile",
      Some(
        "SELECT c_mktsegment, round(quantile_cont(o_totalprice, 0.5),4) AS p50, " +
          "round(quantile_cont(o_totalprice, 0.9),4) AS p90 " +
          "FROM orders JOIN customer ON o_custkey = c_custkey " +
          "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
      (s, dir) => {
        // 5 segment groups over ALL of orders: the percentile aggregate
        // would buffer |orders|/5 values per task — the grouped flavor of
        // the single-task OOM shape. Distributed per-group selection
        // instead; only (segment, 2 quantiles) × 5 reach the driver.
        val joined = t(s, dir, "orders")
          .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        val ps = ExactQuantile.groupedQuantiles(
          joined, "c_mktsegment", "o_totalprice", Seq(0.5, 0.9))
        import s.implicits._
        ps.map { case (k, v) => (k, v(0), v(1)) }
          .toDF("c_mktsegment", "p50raw", "p90raw")
          .select(col("c_mktsegment"),
            round(col("p50raw"), 4).as("p50"), round(col("p90raw"), 4).as("p90"))
          .orderBy(col("c_mktsegment"))
      }),

    // --- approximate sketches, verified against exact: the raw HLL/KLL
    //     values differ per engine, so the hash-compared output is the
    //     exact values PLUS bounded-error flags — EACH engine checks its
    //     own sketch against its own exact answer (HLL stderr ≈ 1.6% and
    //     the KLL default accuracy are both well inside the 5% bound), and
    //     the driver's hash match proves both passed ---
    NamedQuery(
      "q27_approx",
      Some(
        // verdicts as INT 0/1: dtype-identical in both engines' parquet/
        // pandas paths (bool dtype nuances stay out of the hash compare)
        "SELECT exact_parts, exact_supps, " +
          stableRoundSql("exact_median", 4) + " AS exact_median, " +
          "CAST(abs(approx_parts - exact_parts) <= exact_parts * 0.05 AS INT) AS hll_parts_ok, " +
          "CAST(abs(approx_supps - exact_supps) <= exact_supps * 0.05 AS INT) AS hll_supps_ok, " +
          "CAST(abs(approx_median - exact_median) <= exact_median * 0.05 AS INT) AS kll_median_ok " +
          "FROM (SELECT count(DISTINCT l_partkey) AS exact_parts, " +
          "count(DISTINCT l_suppkey) AS exact_supps, " +
          "quantile_cont(l_extendedprice, 0.5) AS exact_median, " +
          "approx_count_distinct(l_partkey) AS approx_parts, " +
          "approx_count_distinct(l_suppkey) AS approx_supps, " +
          "approx_quantile(l_extendedprice, 0.5) AS approx_median FROM lineitem)"),
      (s, dir) => {
        // exact NDVs as partial-aggregated distinct+count (one small
        // shuffle each) rather than count(DISTINCT) in the main aggregate:
        // multi-distinct plans via Expand, which would replicate every row
        // per distinct column and drag the sketch aggregates through 3x
        // the input
        val li = t(s, dir, "lineitem")
        val ep = li.select(col("l_partkey")).distinct()
          .agg(count(lit(1)).as("exact_parts"))
        val es = li.select(col("l_suppkey")).distinct()
          .agg(count(lit(1)).as("exact_supps"))
        // exact median by distributed selection, NOT the `percentile`
        // aggregate: ungrouped exact percentile buffers the whole column
        // in one task — the one shape guaranteed to OOM at 100 TB. This
        // also leaves the remaining aggregate fully partial-aggregable.
        val exactMedian =
          ExactQuantile.quantiles(li, "l_extendedprice", Seq(0.5)).head
        val sk = li.agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_suppkey")).as("approx_supps"),
          expr("percentile_approx(l_extendedprice, 0.5)").as("approx_median"))
          .withColumn("em", lit(exactMedian))
        sk.crossJoin(ep).crossJoin(es)
          .select(
            col("exact_parts"), col("exact_supps"),
            stableRound(col("em"), 4).as("exact_median"),
            (abs(col("approx_parts") - col("exact_parts")) <= col("exact_parts") * 0.05)
              .cast("int").as("hll_parts_ok"),
            (abs(col("approx_supps") - col("exact_supps")) <= col("exact_supps") * 0.05)
              .cast("int").as("hll_supps_ok"),
            (abs(col("approx_median") - col("em")) <= col("em") * 0.05)
              .cast("int").as("kll_median_ok"))
      }),

    // --- timestamp truncation + aggregation over the events table ---
    NamedQuery(
      "q28_events_daily",
      Some(
        "SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n, " +
          "round(sum(value),2) AS total, " + stableRoundSql("avg(value)", 4) + " AS avg_value " +
          "FROM events GROUP BY 1, 2 ORDER BY day, event_type"),
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            round(sum(col("value")), 2).as("total"),
            stableRound(avg(col("value")), 4).as("avg_value"))
          .orderBy(col("day"), col("event_type"))),

    // --- gap-based sessionization via window lag ---
    NamedQuery(
      "q29_sessionize",
      Some(
        "SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events FROM " +
          "(SELECT user_id, CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1 " +
          "WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s " +
          "FROM events) t GROUP BY user_id ORDER BY user_id"),
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .select(col("user_id"), col("ts"), lag(col("ts"), 1).over(w).as("prev_ts"))
          .select(
            col("user_id"),
            when(col("prev_ts").isNull, 1)
              .when(col("ts") - col("prev_ts") > expr("INTERVAL 30 MINUTE"), 1)
              .otherwise(0).as("new_s"))
          .groupBy(col("user_id"))
          .agg(sum(col("new_s")).cast("bigint").as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy(col("user_id"))
      }),

    // --- statistical aggregates (stddev/var/corr/covar) ---
    NamedQuery(
      "q31_stats_agg",
      Some(
        "SELECT l_returnflag, " +
          stableRoundSql("stddev_samp(l_quantity)", 4) + " AS sd_qty, " +
          stableRoundSql("var_samp(l_quantity)", 4) + " AS var_qty, " +
          stableRoundSql("corr(l_quantity, l_extendedprice)", 4) + " AS corr_qp, " +
          stableRoundSql("covar_samp(l_quantity, l_discount)", 4) + " AS covar_qd " +
          "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            stableRound(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
            stableRound(var_samp(col("l_quantity")), 4).as("var_qty"),
            stableRound(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
            stableRound(covar_samp(col("l_quantity"), col("l_discount")), 4).as("covar_qd"))
          .orderBy(col("l_returnflag"))),

    // --- remaining window function family: ntile/percent_rank/cume_dist/
    //     first_value/last_value/nth_value over an explicit full frame ---
    NamedQuery(
      "q32_window_funcs",
      Some(
        "SELECT o_orderkey, o_orderstatus, CAST(ntile(4) OVER w AS INT) AS quartile, " +
          stableRoundSql("percent_rank() OVER w", 6) + " AS pr, " +
          stableRoundSql("cume_dist() OVER w", 6) + " AS cd, " +
          "first_value(o_orderkey) OVER w2 AS first_key, " +
          "last_value(o_orderkey) OVER w2 AS last_key, " +
          "nth_value(o_orderkey, 3) OVER w2 AS third_key " +
          "FROM orders WHERE o_orderkey < 2000 " +
          "WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey), " +
          "w2 AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
          "ORDER BY o_orderkey"),
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val w2 = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "orders")
          .filter(col("o_orderkey") < 2000)
          .select(
            col("o_orderkey"), col("o_orderstatus"),
            ntile(4).over(w).cast("int").as("quartile"),
            stableRound(percent_rank().over(w), 6).as("pr"),
            stableRound(cume_dist().over(w), 6).as("cd"),
            first(col("o_orderkey")).over(w2).as("first_key"),
            last(col("o_orderkey")).over(w2).as("last_key"),
            nth_value(col("o_orderkey"), 3).over(w2).as("third_key"))
          .orderBy(col("o_orderkey"))
      }),

    // --- NULL semantics: nullif/coalesce/null-safe comparison over an
    //     outer join that manufactures NULLs ---
    NamedQuery(
      "q33_null_logic",
      Some(
        "SELECT o_orderstatus AS status, count(*) AS n_rows, count(c_name) AS n_matched, " +
          "count(coalesce(c_name, 'missing')) AS n_coalesced, " +
          "count(nullif(o_orderstatus, 'F')) AS n_not_f, " +
          "CAST(sum(CASE WHEN c_name IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_safe " +
          "FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 9900) c " +
          "ON o_custkey = c_custkey GROUP BY o_orderstatus ORDER BY status"),
      (s, dir) =>
        t(s, dir, "orders")
          .join(
            t(s, dir, "customer").filter(col("c_acctbal") > 9900),
            col("o_custkey") === col("c_custkey"), "left")
          .groupBy(col("o_orderstatus").as("status"))
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("c_name")).as("n_matched"),
            count(coalesce(col("c_name"), lit("missing"))).as("n_coalesced"),
            count(nullif(col("o_orderstatus"), lit("F"))).as("n_not_f"),
            sum(when(col("c_name") <=> lit(null), 1).otherwise(0)).cast("bigint").as("n_null_safe"))
          .orderBy(col("status"))),

    // --- multiset (bag) set operations: INTERSECT ALL / EXCEPT ALL ---
    NamedQuery(
      "q35_multiset_setops",
      Some(
        "SELECT 'inter' AS tag, k, count(*) AS n FROM " +
          "(SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F' " +
          "INTERSECT ALL SELECT o_custkey AS k FROM orders WHERE o_totalprice > 250000) a GROUP BY k " +
          "UNION ALL " +
          "SELECT 'exc' AS tag, k, count(*) AS n FROM " +
          "(SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F' " +
          "EXCEPT ALL SELECT o_custkey AS k FROM orders WHERE o_totalprice > 250000) b GROUP BY k " +
          "ORDER BY tag, k"),
      (s, dir) => {
        // multiset INTERSECT/EXCEPT ALL feeding a GROUP BY lower to count
        // arithmetic over ONE scan: per key, |INTERSECT ALL| = min(cf, cb)
        // and |EXCEPT ALL| = cf - cb (when positive) — the standard
        // engine lowering. Spark's intersectAll/exceptAll operators here
        // cost two more scans plus two joins for identical output (the
        // genuine operators stay exercised by q12's set ops).
        val orders = t(s, dir, "orders")
        val agg = orders.groupBy(col("o_custkey").as("k")).agg(
          count(when(col("o_orderstatus") === "F", 1)).as("cf"),
          count(when(col("o_totalprice") > 250000, 1)).as("cb"))
        agg.filter(col("cf") > 0 && col("cb") > 0)
          .select(lit("inter").as("tag"), col("k"), least(col("cf"), col("cb")).as("n"))
          .unionByName(
            agg.filter(col("cf") > col("cb"))
              .select(lit("exc").as("tag"), col("k"), (col("cf") - col("cb")).as("n")))
          .orderBy(col("tag"), col("k"))
      }),

    // --- LIKE variants: case-insensitive, negated, and escaped wildcard ---
    NamedQuery(
      "q36_like_variants",
      Some(
        "SELECT p_partkey, p_name FROM part WHERE p_name ILIKE '%WID%' " +
          "AND p_name NOT LIKE 'small%' AND p_brand LIKE 'Brand#1_' ESCAPE '\\' " +
          "ORDER BY p_partkey"),
      (s, dir) =>
        t(s, dir, "part")
          .filter(
            col("p_name").ilike("%WID%") &&
              !col("p_name").like("small%") &&
              col("p_brand").like("Brand#1_"))
          .select(col("p_partkey"), col("p_name"))
          .orderBy(col("p_partkey"))),

    // --- 6-way join through region (TPC-H Q5 shape): revenue only counts
    //     when customer and supplier share the nation ---
    NamedQuery(
      "q42_local_supplier_volume",
      Some(
        "SELECT n_name AS nation, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue " +
          "FROM customer JOIN orders ON c_custkey = o_custkey " +
          "JOIN lineitem ON l_orderkey = o_orderkey " +
          "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
          "JOIN nation ON s_nationkey = n_nationkey " +
          "JOIN region ON n_regionkey = r_regionkey " +
          "WHERE r_name IN ('ASIA', 'EUROPE') " +
          "GROUP BY n_name ORDER BY nation"),
      (s, dir) => {
        val region = t(s, dir, "region").filter(col("r_name").isin("ASIA", "EUROPE"))
        val nation = t(s, dir, "nation")
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        val supplier = t(s, dir, "supplier")
          .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(supplier),
            col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
          .groupBy(col("n_name").as("nation"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
          .orderBy(col("nation"))
      }),

    // --- bitwise operator family ---
    NamedQuery(
      "q40_bitwise",
      Some(
        "SELECT p_partkey, CAST(p_size & 12 AS BIGINT) AS b_and, CAST(p_size | 3 AS BIGINT) AS b_or, " +
          "CAST(xor(p_size, 21) AS BIGINT) AS b_xor, CAST(p_size << 2 AS BIGINT) AS b_shl, " +
          "CAST(p_size >> 1 AS BIGINT) AS b_shr FROM part WHERE p_partkey < 300 ORDER BY p_partkey"),
      (s, dir) =>
        t(s, dir, "part")
          .filter(col("p_partkey") < 300)
          .select(
            col("p_partkey"),
            expr("p_size & 12").cast("bigint").as("b_and"),
            expr("p_size | 3").cast("bigint").as("b_or"),
            expr("p_size ^ 21").cast("bigint").as("b_xor"),
            expr("shiftleft(p_size, 2)").cast("bigint").as("b_shl"),
            expr("shiftright(p_size, 1)").cast("bigint").as("b_shr"))
          .orderBy(col("p_partkey"))),

    // --- ordered string aggregation (listagg/string_agg) ---
    NamedQuery(
      "q41_string_agg",
      Some(
        "SELECT l_returnflag, string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses, " +
          "count(*) AS n FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            concat_ws(",", array_sort(collect_set(col("l_linestatus")))).as("statuses"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"))),

    // --- deep multi-join (TPC-H Q9 shape): 5-table star join with
    //     derived-column aggregation by nation and year ---
    NamedQuery(
      "q39_profit_by_nation",
      Some(
        "SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
          "round(sum(l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity), 4) AS profit " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
          "JOIN part ON l_partkey = p_partkey " +
          "JOIN supplier ON l_suppkey = s_suppkey " +
          "JOIN nation ON s_nationkey = n_nationkey " +
          "WHERE p_name LIKE '%bolt%' " +
          "GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT) " +
          "ORDER BY nation, o_year"),
      (s, dir) =>
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, dir, "part").filter(col("p_name").like("%bolt%"))),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("bigint").as("o_year"))
          .agg(round(sum(
            col("l_extendedprice") * (lit(1) - col("l_discount")) -
              col("p_retailprice") * col("l_quantity")), 4).as("profit"))
          .orderBy(col("nation"), col("o_year"))),

    // --- datetime field extraction: dow/doy/week/epoch/last_day/add_months
    //     (Spark dayofweek is 1-based Sunday, DuckDB dow is 0-based) ---
    NamedQuery(
      "q38_datetime_parts",
      Some(
        "SELECT o_orderkey, CAST(date_part('dow', o_orderdate) AS BIGINT) AS dow, " +
          "CAST(date_part('doy', o_orderdate) AS BIGINT) AS doy, " +
          "CAST(date_part('week', o_orderdate) AS BIGINT) AS week, " +
          "CAST(date_part('epoch', o_orderdate) AS BIGINT) AS epoch_s, " +
          "CAST(last_day(o_orderdate) AS TIMESTAMP) AS eom, " +
          "CAST(CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS TIMESTAMP) AS next_month " +
          "FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey"),
      (s, dir) =>
        t(s, dir, "orders")
          .filter(col("o_orderkey") < 500)
          .select(
            col("o_orderkey"),
            (dayofweek(col("o_orderdate")) - 1).cast("bigint").as("dow"),
            dayofyear(col("o_orderdate")).cast("bigint").as("doy"),
            weekofyear(col("o_orderdate")).cast("bigint").as("week"),
            unix_timestamp(col("o_orderdate").cast("timestamp")).cast("bigint").as("epoch_s"),
            last_day(col("o_orderdate")).cast("timestamp_ntz").as("eom"),
            add_months(col("o_orderdate"), 1).cast("timestamp_ntz").as("next_month"))
          .orderBy(col("o_orderkey"))),

    // --- generator/explode: token frequency over the corpus (Spark
    //     explode ≡ DuckDB unnest) ---
    NamedQuery(
      "q37_explode_tokens",
      Some(
        "SELECT token, count(*) AS n FROM (SELECT unnest(string_split(lower(text), ' ')) AS token " +
          "FROM documents) t GROUP BY token ORDER BY n DESC, token LIMIT 20"),
      (s, dir) =>
        t(s, dir, "documents")
          .select(explode(split(lower(col("text")), " ")).as("token"))
          .groupBy(col("token"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(20)),

    // --- ordered funnel over the events stream (same SQL, both engines):
    //     view → click-after-view → purchase-after-click per user ---
    viaSql(
      "WITH v AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id), " +
        "c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1 " +
        "WHERE e.event_type = 'click' GROUP BY e.user_id), " +
        "p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2 " +
        "WHERE e.event_type = 'purchase' GROUP BY e.user_id) " +
        "SELECT (SELECT count(*) FROM v) AS n_view, (SELECT count(*) FROM c) AS n_click_after_view, " +
        "(SELECT count(*) FROM p) AS n_purchase_after_click").named("q34_funnel"),

    // --- equi join with additional range (theta) condition ---
    NamedQuery(
      "q30_join_range",
      Some(
        "SELECT o_orderstatus AS status, count(*) AS n FROM lineitem JOIN orders " +
          "ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 90 DAY " +
          "GROUP BY o_orderstatus ORDER BY status"),
      (s, dir) =>
        t(s, dir, "lineitem")
          .join(
            t(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"))
          .groupBy(col("o_orderstatus").as("status"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("status"))),

    // --- AS-OF join: for every purchase, the user's latest click at or
    //     before it. Spark has no ASOF operator; the scalable encoding is
    //     the union-marker + running last_value window — ONE shuffle on
    //     user_id, no join explosion, linear in input (the classic
    //     point-in-time-correct feature lookup). DuckDB verifies with its
    //     native ASOF LEFT JOIN. Right side is pre-deduped per (user, ts)
    //     so tie-breaking is engine-independent. ---
    NamedQuery(
      "q43_asof_join",
      Some(
        "SELECT p.event_id, p.user_id, p.ts, p.value, c.ts AS click_ts, c.value AS click_value " +
          "FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') p " +
          "ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS value FROM events " +
          "WHERE event_type = 'click' GROUP BY user_id, ts) c " +
          "ON p.user_id = c.user_id AND p.ts >= c.ts ORDER BY p.event_id"),
      (s, dir) => {
        val e = t(s, dir, "events")
        val right = e.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("cv"))
        val left = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val tagged = right
          .select(col("user_id"), col("ts"), lit(null).cast("bigint").as("event_id"),
            lit(null).cast("double").as("value"), col("cv"), lit(0).as("side"))
          .unionByName(left
            .select(col("user_id"), col("ts"), col("event_id"), col("value"),
              lit(null).cast("double").as("cv"), lit(1).as("side")))
        // equal timestamps sort the click (side 0) before the purchase, so
        // the running last-click includes ts-equal clicks — ASOF >= parity
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("side"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tagged
          // one select → both running values share ONE Window node (a
          // second withColumn would interleave a Project and split them)
          .select(col("*"),
            last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w).as("click_ts"),
            last(when(col("side") === 0, col("cv")), ignoreNulls = true).over(w).as("click_value"))
          .filter(col("side") === 1)
          .select(col("event_id"), col("user_id"), col("ts"), col("value"),
            col("click_ts"), col("click_value"))
          .orderBy(col("event_id"))
      }),

    // --- wide scalar-function matrix: one row per part, ~18 functions
    //     from the string/math library that both engines share by name or
    //     near-name (Spark instr ≡ DuckDB strpos, signum ≡ sign) ---
    NamedQuery(
      "q45_function_matrix",
      Some(
        "SELECT p_partkey, lpad(p_brand, 12, '*') AS lpadded, rpad(p_brand, 12, '*') AS rpadded, " +
          "reverse(p_name) AS rev, translate(p_type, 'EO', 'eo') AS transl, " +
          "repeat(left(p_name, 2), 3) AS rep, left(p_name, 5) AS l5, right(p_name, 4) AS r4, " +
          "split_part(p_name, ' ', 2) AS word2, CAST(strpos(p_name, 'widget') AS INT) AS pos, " +
          "CAST(ascii(p_name) AS INT) AS asc0, chr(65 + CAST(p_partkey % 26 AS INT)) AS letter, " +
          "CAST(levenshtein(p_brand, p_type) AS INT) AS lev, " +
          "CAST(bit_length(p_brand) AS INT) AS bits, md5(p_name) AS digest, " +
          "CAST(sign(p_retailprice - 1000) AS INT) AS sgn, " +
          OracleRound.stableRoundSql("degrees(p_retailprice / 1000)", 4) + " AS deg, " +
          OracleRound.stableRoundSql("radians(p_size)", 4) + " AS rad, " +
          OracleRound.stableRoundSql("cbrt(p_retailprice)", 4) + " AS cub, " +
          OracleRound.stableRoundSql("log2(p_retailprice)", 4) + " AS lg2, " +
          OracleRound.stableRoundSql("atan2(p_retailprice, p_size)", 4) + " AS at2 " +
          "FROM part WHERE p_partkey < 200 ORDER BY p_partkey"),
      (s, dir) =>
        t(s, dir, "part")
          .filter(col("p_partkey") < 200)
          .select(
            col("p_partkey"),
            lpad(col("p_brand"), 12, "*").as("lpadded"),
            rpad(col("p_brand"), 12, "*").as("rpadded"),
            reverse(col("p_name")).as("rev"),
            translate(col("p_type"), "EO", "eo").as("transl"),
            expr("repeat(left(p_name, 2), 3)").as("rep"),
            expr("left(p_name, 5)").as("l5"),
            expr("right(p_name, 4)").as("r4"),
            expr("split_part(p_name, ' ', 2)").as("word2"),
            instr(col("p_name"), "widget").cast("int").as("pos"),
            ascii(col("p_name")).cast("int").as("asc0"),
            expr("chr(65 + CAST(p_partkey % 26 AS INT))").as("letter"),
            levenshtein(col("p_brand"), col("p_type")).cast("int").as("lev"),
            bit_length(col("p_brand")).cast("int").as("bits"),
            md5(col("p_name")).as("digest"),
            signum(col("p_retailprice") - 1000).cast("int").as("sgn"),
            stableRound(degrees(col("p_retailprice") / 1000), 4).as("deg"),
            stableRound(radians(col("p_size")), 4).as("rad"),
            stableRound(cbrt(col("p_retailprice")), 4).as("cub"),
            stableRound(log2(col("p_retailprice")), 4).as("lg2"),
            stableRound(atan2(col("p_retailprice"), col("p_size").cast("double")), 4).as("at2"))
          .orderBy(col("p_partkey"))),

    // --- array/list function matrix over tokenized documents: Spark
    //     array_* ≡ DuckDB list_* (results order-normalized via sort
    //     where construction order could differ) ---
    NamedQuery(
      "q46_array_funcs",
      Some(
        "SELECT doc_id, CAST(len(list_distinct(tk)) AS INT) AS n_distinct, " +
          "CAST(list_max(list_transform(tk, t -> length(t))) AS INT) AS max_len, " +
          "CAST(list_min(list_transform(tk, t -> length(t))) AS INT) AS min_len, " +
          "CAST(coalesce(list_position(tk, 'the'), 0) AS INT) AS pos_the, " +
          "CAST(list_contains(tk, 'and') AS INT) AS has_and, " +
          "array_to_string(list_slice(list_sort(list_distinct(tk)), 1, 3), '-') AS first3, " +
          "CAST(list_sum(list_transform(tk, t -> length(t))) AS BIGINT) AS sum_len " +
          "FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents WHERE doc_id < 100) " +
          "ORDER BY doc_id"),
      (s, dir) =>
        t(s, dir, "documents")
          .filter(col("doc_id") < 100)
          .withColumn("tk", split(col("text"), " "))
          .select(
            col("doc_id"),
            size(array_distinct(col("tk"))).cast("int").as("n_distinct"),
            array_max(expr("transform(tk, t -> length(t))")).cast("int").as("max_len"),
            array_min(expr("transform(tk, t -> length(t))")).cast("int").as("min_len"),
            array_position(col("tk"), "the").cast("int").as("pos_the"),
            array_contains(col("tk"), "and").cast("int").as("has_and"),
            array_join(slice(array_sort(array_distinct(col("tk"))), 1, 3), "-").as("first3"),
            expr("aggregate(transform(tk, t -> CAST(length(t) AS BIGINT)), 0L, (a, x) -> a + x)")
              .as("sum_len"))
          .orderBy(col("doc_id"))),

    // --- datetime function matrix: day/month distances, quarter trunc,
    //     locale names, interval shift, clamp, month anchor (DuckDB
    //     date_diff('day') counts boundaries ≡ Spark datediff on the
    //     midnight-aligned o_orderdate; month distance spelled as the
    //     engine-neutral year*12+month difference) ---
    NamedQuery(
      "q47_datetime_matrix",
      Some(
        "SELECT o_orderkey, " +
          "CAST(date_diff('day', o_orderdate, TIMESTAMP '1997-06-15') AS BIGINT) AS days_to_anchor, " +
          "CAST((1997*12 + 6) - (year(o_orderdate)*12 + month(o_orderdate)) AS BIGINT) AS months_to_anchor, " +
          "CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS qtr, " +
          "dayname(o_orderdate) AS dow_name, monthname(o_orderdate) AS mon_name, " +
          "CAST(o_orderdate + INTERVAL 45 DAY AS TIMESTAMP) AS plus45, " +
          "CAST(greatest(o_orderdate, TIMESTAMP '1997-01-01') AS TIMESTAMP) AS clamped, " +
          "CAST(make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1) AS TIMESTAMP) AS month_start " +
          "FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey"),
      (s, dir) =>
        t(s, dir, "orders")
          .filter(col("o_orderkey") < 300)
          .select(
            col("o_orderkey"),
            datediff(lit("1997-06-15").cast("date"), col("o_orderdate")).cast("bigint")
              .as("days_to_anchor"),
            (lit(1997 * 12 + 6) - (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))))
              .cast("bigint").as("months_to_anchor"),
            date_trunc("quarter", col("o_orderdate")).cast("timestamp_ntz").as("qtr"),
            date_format(col("o_orderdate"), "EEEE").as("dow_name"),
            date_format(col("o_orderdate"), "MMMM").as("mon_name"),
            (col("o_orderdate") + expr("INTERVAL 45 DAY")).cast("timestamp_ntz").as("plus45"),
            greatest(col("o_orderdate"), lit("1997-01-01").cast("timestamp"))
              .cast("timestamp_ntz").as("clamped"),
            make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1))
              .cast("timestamp_ntz").as("month_start"))
          .orderBy(col("o_orderkey"))),

    // --- IGNORE NULLS window variants: lead/lag skip nulls; first/last
    //     over the full frame. Window order (l_linenumber, l_quantity,
    //     l_partkey) is verified UNIQUE per order at every SF, so the
    //     offset functions are deterministic across engines ---
    NamedQuery(
      "q48_window_ignore_nulls",
      Some(
        "SELECT l_orderkey, l_linenumber, l_quantity, l_partkey, " +
          "lag(nullif(l_returnflag, 'N') IGNORE NULLS) OVER w AS prev_flag, " +
          "lead(nullif(l_returnflag, 'N') IGNORE NULLS) OVER w AS next_flag, " +
          "first_value(nullif(l_returnflag, 'N') IGNORE NULLS) OVER wf AS first_flag, " +
          "last_value(nullif(l_returnflag, 'N') IGNORE NULLS) OVER wf AS last_flag " +
          "FROM lineitem WHERE l_orderkey < 300 " +
          "WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity, l_partkey), " +
          "wf AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity, l_partkey " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
          "ORDER BY l_orderkey, l_linenumber, l_quantity, l_partkey"),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_linenumber"), col("l_quantity"), col("l_partkey"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "lineitem")
          .filter(col("l_orderkey") < 300)
          .withColumn("flag", nullif(col("l_returnflag"), lit("N")))
          .select(
            col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_partkey"),
            lag(col("flag"), 1, null, ignoreNulls = true).over(w).as("prev_flag"),
            lead(col("flag"), 1, null, ignoreNulls = true).over(w).as("next_flag"),
            first(col("flag"), ignoreNulls = true).over(wf).as("first_flag"),
            last(col("flag"), ignoreNulls = true).over(wf).as("last_flag"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_partkey"))
      }),

    // --- correlated LATERAL subquery with ORDER BY + LIMIT: per-order
    //     top-2 line items — the "top-k per group as a join" spelling
    //     (same text through both engines; selection fully tie-broken,
    //     (orderkey, linenumber, quantity, partkey) is unique) ---
    viaSql(
      "SELECT o.o_orderkey, l.l_extendedprice AS price, l.l_linenumber, l.l_partkey, l.l_quantity " +
        "FROM orders o, LATERAL (SELECT l_extendedprice, l_linenumber, l_partkey, l_quantity " +
        "FROM lineitem WHERE l_orderkey = o.o_orderkey " +
        "ORDER BY l_extendedprice DESC, l_linenumber, l_partkey, l_quantity LIMIT 2) l " +
        "WHERE o.o_orderkey < 300 " +
        "ORDER BY o.o_orderkey, price DESC, l.l_linenumber, l.l_partkey, l.l_quantity")
      .named("q51_lateral"),

    // --- RECURSIVE CTE: calendar gap-fill — generate the full year
    //     series spanning the data and LEFT JOIN the facts onto it, so
    //     empty periods surface as zero rows (the standard time-series
    //     reporting pattern a bare GROUP BY cannot produce). DataFusion 47
    //     ships recursive CTEs in the surface the reference delegates to
    //     (src/sql/mod.rs:84); Spark 4 matches with WITH RECURSIVE — same
    //     text through both engines. Depth = year span (bounded by the
    //     data, far under Spark's recursion limit); the recursion produces
    //     only the tiny series relation, never touches fact rows ---
    viaSql(
      "WITH RECURSIVE years AS (" +
        "SELECT year(min(o_orderdate)) AS y, year(max(o_orderdate)) AS ymax FROM orders " +
        "UNION ALL SELECT y + 1, ymax FROM years WHERE y < ymax) " +
        "SELECT y.y AS yr, count(o.o_orderkey) AS n_orders " +
        "FROM years y LEFT JOIN orders o ON year(o.o_orderdate) = y.y " +
        "GROUP BY y.y ORDER BY yr")
      .named("q52_recursive_series"),

    // --- PIVOT: long→wide reshape with an EXPLICIT value list (the
    //     deterministic form — inferred pivot values would depend on a
    //     distinct scan). The oracle replays it as conditional
    //     aggregation, which is also exactly how Catalyst lowers PIVOT ---
    NamedQuery(
      "q49_pivot",
      Some(
        "SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, " +
          "CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS \"click\", " +
          "CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS \"view\", " +
          "CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS \"purchase\", " +
          "CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS \"signup\", " +
          "CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS \"error\" " +
          "FROM events GROUP BY 1 ORDER BY day"),
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy(col("day"))),

    // --- GROUPING/GROUPING_ID markers under ROLLUP: how a consumer tells
    //     a subtotal row's NULL from a data NULL ---
    NamedQuery(
      "q50_grouping_id",
      Some(
        "SELECT coalesce(l_returnflag, '!') AS rf, coalesce(l_linestatus, '!') AS ls, " +
          "CAST(grouping(l_returnflag) AS INT) AS g_rf, " +
          "CAST(grouping(l_linestatus) AS INT) AS g_ls, " +
          "CAST(grouping(l_returnflag, l_linestatus) AS INT) AS gid, " +
          "CAST(count(*) AS BIGINT) AS n " +
          "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus) " +
          "ORDER BY gid, rf, ls"),
      (s, dir) =>
        t(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            grouping(col("l_returnflag")).cast("int").as("g_rf"),
            grouping(col("l_linestatus")).cast("int").as("g_ls"),
            grouping_id().cast("int").as("gid"),
            count(lit(1)).as("n"))
          .select(
            coalesce(col("l_returnflag"), lit("!")).as("rf"),
            coalesce(col("l_linestatus"), lit("!")).as("ls"),
            col("g_rf"), col("g_ls"), col("gid"), col("n"))
          .orderBy(col("gid"), col("rf"), col("ls"))),

    // --- JSON property extraction from the events props column ---
    NamedQuery(
      "q44_json_extract",
      Some(
        "SELECT event_type, count(*) AS n, " +
          "CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k, " +
          "CAST(max(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k " +
          "FROM events GROUP BY event_type ORDER BY event_type"),
      (s, dir) =>
        t(s, dir, "events")
          .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
          .orderBy(col("event_type")))
  )
}
