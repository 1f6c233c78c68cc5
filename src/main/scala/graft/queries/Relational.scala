package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.CrossHash._

/** Relational-parity layer (SURVEY.md §2.2, "host-engine" rows).
  *
  * The reference extension implements exactly one operator (the Kafka scan);
  * every relational capability its users exercise — projection, filter, join,
  * aggregation, windows, set ops, sort/limit, scalar functions — comes from
  * the host DuckDB engine above the scan (reference: README.md:13,31-38).
  * Here those capabilities are declared with the DataFrame API so Catalyst
  * owns the physical strategy (pushdown, broadcast, partial agg, AQE), and
  * each query is hash-checked against a DuckDB oracle on the same parquet.
  *
  * Determinism rules for cross-engine equality (see CrossHash):
  * money sums go through DECIMAL(18,2); every result is fully ordered.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1-style pricing summary: grouped agg with partial+final (map-side
    // combine) — the canonical scan→agg shape; Catalyst pushes the shipdate
    // filter and prunes columns at the parquet scan.
    "q01_pricing_summary" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          drevenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Filter + projection: verifies predicate pushdown + column pruning reach
    // the scan (PushedFilters/ReadSchema in .explain).
    "q02_filter_project" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // Q3-style shipping priority: 3-way join + agg + top-k. customer is tiny
    // relative to lineitem → explicit broadcast keeps the big fact unshuffled
    // until the orderkey agg.
    "q03_top_orders" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp_ntz"))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      li.join(broadcast(ord.join(broadcast(cust),
          ord("o_custkey") === cust("c_custkey"))),
          li("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    // Star-schema rollup over broadcast dims: supplier ⋈ nation ⋈ region.
    "q04_region_supplier" -> { (s, dir) =>
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      sup.join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          dsum(col("s_acctbal")).as("sum_acctbal"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // Ranking window: top-3 orders per customer (row_number, deterministic
    // tiebreak on orderkey). One shuffle on o_custkey.
    "q05_window_topk" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    },

    // Global sort + limit → Spark's TakeOrderedAndProject (no full sort of
    // the whole relation at scale).
    "q06_sort_limit" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    },

    // Set operations (distinct semantics in both engines).
    "q07_setops" -> { (s, dir) =>
      val ord = t(s, dir, "orders")
      def ck(status: String) =
        ord.filter(col("o_orderstatus") === status).select(col("o_custkey"))
      def cnt(df: DataFrame, name: String) =
        df.agg(count(lit(1)).as("n")).select(lit(name).as("op"), col("n"))
      cnt(ck("F").intersect(ck("O")), "f_intersect_o")
        .unionAll(cnt(ck("F").except(ck("O")), "f_except_o"))
        .unionAll(cnt(ck("F").union(ck("O")).distinct(), "f_union_o"))
        .orderBy(col("op"))
    },

    // ROLLUP hierarchy with NULL-total rows made explicit via coalesce so
    // both engines order identically.
    "q08_rollup" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy(col("rf"), col("ls"))
    },

    // Multi-column exact distinct aggregation (expand + two-phase agg).
    "q09_distinct" -> { (s, dir) =>
      t(s, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"))
    },

    // Semi/anti joins (EXISTS / NOT EXISTS): no payload from the right side,
    // so Spark builds only a key set; broadcastable at scale.
    "q10_semi_anti" -> { (s, dir) =>
      val cust = t(s, dir, "customer").select(col("c_custkey"))
      val ordKeys = t(s, dir, "orders").select(col("o_custkey"))
      def cnt(df: DataFrame, name: String) =
        df.agg(count(lit(1)).as("n")).select(lit(name).as("op"), col("n"))
      cnt(cust.join(ordKeys, cust("c_custkey") === ordKeys("o_custkey"),
          "left_semi"), "with_orders")
        .unionAll(cnt(cust.join(ordKeys,
          cust("c_custkey") === ordKeys("o_custkey"), "left_anti"),
          "without_orders"))
        .orderBy(col("op"))
    },

    // Scalar string functions — all codegen'd builtins, no UDFs.
    "q11_string_funcs" -> { (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_name").like("%ar%"))
        .select(col("p_partkey"),
          upper(substring(col("p_name"), 1, 8)).as("up8"),
          length(col("p_name")).as("name_len"),
          regexp_replace(col("p_brand"), "#", "-").as("brand2"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
        .orderBy(col("p_partkey"))
    },

    // Temporal bucketing: month truncation + min/max range per bucket.
    "q12_date_trunc" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n"),
          min(col("o_orderdate")).as("first_order"),
          max(col("o_orderdate")).as("last_order"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("month"))
    },

    // JSON payload extraction (the events props column) — get_json_object
    // stays inside codegen; mirrors DuckDB json_extract_string.
    "q13_json_extract" -> { (s, dir) =>
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    },

    // CASE-based bucketing + conditional aggregation.
    "q14_case_buckets" -> { (s, dir) =>
      t(s, dir, "events")
        .withColumn("bucket",
          when(col("value") < 5.0, "low")
            .when(col("value") < 50.0, "mid")
            .otherwise("high"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("event_type"), col("bucket"))
    },

    // Running (prefix) sum per customer — frame-based analytic window.
    // DECIMAL running sum keeps every prefix exactly reproducible.
    "q15_running_sum" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .withColumn("running_spend",
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    },

    // Epoch-aligned tumbling window over event time — batch twin of the
    // Structured Streaming groupBy(window(...)) (SURVEY.md §2.2 streaming
    // windows row); DuckDB's time_bucket uses the same epoch alignment.
    "q16_tumbling_window" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "5 minutes").getField("start").as("bucket"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("bucket"), col("event_type"))
    },

    // Sliding (hopping) windows: 10-minute windows every 5 minutes — each
    // event lands in exactly two overlapping windows. Same shuffle shape as
    // q16 (the expand is map-side).
    "q34_sliding_window" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "10 minutes", "5 minutes")
          .getField("start").as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("bucket"), col("event_type"))
    },

    // Sessionization via gap detection: lag + conditional flag + prefix sum —
    // the batch analogue of session_window (single shuffle on user_id).
    "q17_sessionize" -> { (s, dir) =>
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      // NTZ → LTZ cast under the UTC session so unix_micros applies; DuckDB
      // epoch_us on the naive timestamp yields the same microsecond count.
      val us = unix_micros(col("ts").cast("timestamp"))
      val gapUs = us - lag(us, 1).over(byUser)
      t(s, dir, "events")
        .withColumn("new_session",
          when(gapUs.isNull || gapUs > 1800L * 1000000L, 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },

    // Correlated EXISTS via semi join + agg.
    "q18_exists_agg" -> { (s, dir) =>
      val ord = t(s, dir, "orders")
      val bigLines = t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45).select(col("l_orderkey"))
      ord.join(bigLines, ord("o_orderkey") === bigLines("l_orderkey"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    },

    // GROUPING SETS through the SQL surface (spark.sql over registered
    // views) — exercises the same parser path a reference user would take
    // after CREATE VIEW (reference README.md:31-38).
    "q19_grouping_sets" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority), ())
        ORDER BY status, priority""")
    })

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
        count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q02_filter_project" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
      ORDER BY l_orderkey, l_linenumber""",

    "q03_top_orders" -> """
      SELECT o_orderkey, o_orderdate,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1996-01-01'
      GROUP BY o_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderkey LIMIT 10""",

    "q04_region_supplier" -> """
      SELECT r_name, n_name, count(*) AS n_suppliers,
        CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
      FROM supplier, nation, region
      WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name""",

    "q05_window_topk" -> """
      SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) WHERE rn <= 3
      ORDER BY o_custkey, rn""",

    "q06_sort_limit" -> """
      SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""",

    "q07_setops" -> """
      SELECT 'f_intersect_o' AS op, count(*) AS n FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus='F'
        INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus='O')
      UNION ALL
      SELECT 'f_except_o' AS op, count(*) AS n FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus='F'
        EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus='O')
      UNION ALL
      SELECT 'f_union_o' AS op, count(*) AS n FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus='F'
        UNION SELECT o_custkey FROM orders WHERE o_orderstatus='O')
      ORDER BY op""",

    "q08_rollup" -> """
      SELECT coalesce(l_returnflag, 'ALL') AS rf,
             coalesce(l_linestatus, 'ALL') AS ls,
             count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY rf, ls""",

    "q09_distinct" -> """
      SELECT count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_suppkey) AS n_supps,
             count(DISTINCT l_orderkey) AS n_orders,
             count(*) AS n_rows
      FROM lineitem""",

    "q10_semi_anti" -> """
      SELECT 'with_orders' AS op, count(*) AS n FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      UNION ALL
      SELECT 'without_orders' AS op, count(*) AS n FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY op""",

    "q11_string_funcs" -> """
      SELECT p_partkey, upper(substr(p_name, 1, 8)) AS up8,
             CAST(length(p_name) AS INT) AS name_len,
             regexp_replace(p_brand, '#', '-', 'g') AS brand2,
             concat_ws('|', p_brand, p_type) AS brand_type
      FROM part WHERE p_name LIKE '%ar%' ORDER BY p_partkey""",

    "q12_date_trunc" -> """
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, count(*) AS n,
             min(o_orderdate) AS first_order, max(o_orderdate) AS last_order,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders GROUP BY 1 ORDER BY month""",

    "q13_json_extract" -> """
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
             min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
             max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q14_case_buckets" -> """
      SELECT event_type,
             CASE WHEN value < 5 THEN 'low' WHEN value < 50 THEN 'mid'
                  ELSE 'high' END AS bucket,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY event_type, bucket""",

    "q15_running_sum" -> """
      SELECT o_custkey, o_orderkey, o_orderdate,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS running_spend
      FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""",

    "q16_tumbling_window" -> """
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket, event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""",

    "q34_sliding_window" -> """
      WITH w AS (SELECT event_type, value,
          unnest([time_bucket(INTERVAL '5 minutes', ts),
                  time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'])
            AS bucket
        FROM events)
      SELECT bucket, event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM w GROUP BY 1, 2 ORDER BY bucket, event_type""",

    "q17_sessionize" -> """
      WITH flagged AS (
        SELECT user_id,
          CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
               THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
      FROM flagged GROUP BY user_id ORDER BY user_id""",

    "q18_exists_agg" -> """
      SELECT o_orderpriority, count(*) AS n FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q19_grouping_sets" -> """
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                              (o_orderstatus, o_orderpriority), ())
      ORDER BY status, priority""")
}
