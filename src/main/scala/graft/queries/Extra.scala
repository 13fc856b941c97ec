package graft.queries

import graft.{GQuery, Tables}
import org.apache.spark.sql.functions._

/** Extended relational surface: operator families beyond the reference's
  * own inventory that a complete engine must expose (SURVEY.md §2.11 note
  * + §7.2 step 7) — pivot, cube, full-outer/cross joins, explode, JSON
  * extraction, date arithmetic, exact percentiles, deterministic moment
  * statistics, as-of and range joins, batch sessionization. Each carries
  * a DuckDB oracle; dialect differences are hand-mirrored per query.
  */
object Extra {

  /** Register testdata views once per call (idempotent). */
  private def q(headline: Boolean = false)(sparkSql: String, duckSql: String): GQuery =
    GQuery(
      fn = (s, dir) => {
        Seq("orders", "customer", "lineitem", "region", "nation").foreach { t =>
          Tables.load(s, dir, t).createOrReplaceTempView(t)
        }
        Tables.events(s, dir).createOrReplaceTempView("events")
        Tables.documents(s, dir).createOrReplaceTempView("documents")
        s.sql(sparkSql)
      },
      oracle = Some(duckSql),
      headline = headline)

  /** e01 — pivot: per-nation order counts by market segment. Spark
    * `PIVOT` ≡ DuckDB conditional aggregation (grouped CASE sums). */
  private val e01 = q()(
    sparkSql = """
      SELECT c_nationkey,
        coalesce(automobile, 0) AS automobile, coalesce(building, 0) AS building,
        coalesce(furniture, 0) AS furniture, coalesce(household, 0) AS household,
        coalesce(machinery, 0) AS machinery
      FROM (
        SELECT * FROM (
          SELECT c_nationkey, c_mktsegment FROM customer)
        PIVOT (CAST(count(*) AS BIGINT)
               FOR c_mktsegment IN ('AUTOMOBILE' AS automobile, 'BUILDING' AS building,
                 'FURNITURE' AS furniture, 'HOUSEHOLD' AS household, 'MACHINERY' AS machinery)))
      ORDER BY c_nationkey""",
    duckSql = """
      SELECT c_nationkey,
        CAST(count(*) FILTER (c_mktsegment = 'AUTOMOBILE') AS BIGINT) AS automobile,
        CAST(count(*) FILTER (c_mktsegment = 'BUILDING') AS BIGINT) AS building,
        CAST(count(*) FILTER (c_mktsegment = 'FURNITURE') AS BIGINT) AS furniture,
        CAST(count(*) FILTER (c_mktsegment = 'HOUSEHOLD') AS BIGINT) AS household,
        CAST(count(*) FILTER (c_mktsegment = 'MACHINERY') AS BIGINT) AS machinery
      FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""")

  /** e02 — CUBE grouping sets with NULL-label coalescing (non-null
    * grouping columns, so the labels are unambiguous). */
  private val e02 = q()(
    sparkSql = """
      SELECT coalesce(l_returnflag, '*') AS rf, coalesce(l_linestatus, '*') AS ls,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY rf, ls""",
    duckSql = """
      SELECT coalesce(l_returnflag, '*') AS rf, coalesce(l_linestatus, '*') AS ls,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY rf, ls""")

  /** e03 — FULL OUTER join of customers against per-customer order
    * aggregates (order-less customers keep NULL aggregates). */
  private val e03 = q()(
    sparkSql = """
      SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey, c.c_name,
        o.n_orders, o.revenue
      FROM customer c FULL OUTER JOIN (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
          CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM orders GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
      ORDER BY custkey""",
    duckSql = """
      SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey, c.c_name,
        o.n_orders, o.revenue
      FROM customer c FULL OUTER JOIN (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
          CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM orders GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
      ORDER BY custkey""")

  /** e04 — CROSS join (tiny × tiny: region × distinct order status). */
  private val e04 = q()(
    sparkSql = """
      SELECT r_name, s.o_orderstatus
      FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
      ORDER BY r_name, o_orderstatus""",
    duckSql = """
      SELECT r_name, s.o_orderstatus
      FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
      ORDER BY r_name, o_orderstatus""")

  /** e05 — explode/unnest + aggregate: corpus word frequency. */
  private val e05 = q()(
    sparkSql = """
      SELECT w, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT explode(split(text, ' ')) AS w FROM documents)
      GROUP BY w ORDER BY w""",
    duckSql = """
      SELECT w, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w ORDER BY w""")

  /** e06 — date arithmetic: offsets, boundary-crossing diffs, month
    * truncation, last-of-month, day-of-year. */
  private val e06 = q()(
    sparkSql = """
      SELECT o_orderkey,
        date_add(CAST(o_orderdate AS DATE), 30) AS due_date,
        CAST(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS BIGINT) AS days_since_95,
        CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        last_day(CAST(o_orderdate AS DATE)) AS month_end,
        CAST(dayofyear(o_orderdate) AS BIGINT) AS doy
      FROM orders ORDER BY o_orderkey""",
    duckSql = """
      SELECT o_orderkey,
        CAST(o_orderdate AS DATE) + 30 AS due_date,
        CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_95,
        CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        last_day(CAST(o_orderdate AS DATE)) AS month_end,
        CAST(dayofyear(o_orderdate) AS BIGINT) AS doy
      FROM orders ORDER BY o_orderkey""")

  /** e07 — conditional scalar functions: CASE, nullif, coalesce,
    * greatest/least over account balances. */
  private val e07 = q()(
    sparkSql = """
      SELECT c_custkey,
        CASE WHEN c_acctbal < 0 THEN 'overdrawn' WHEN c_acctbal = 0 THEN 'zero'
             ELSE 'credit' END AS bal_class,
        coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked,
        CAST(greatest(c_acctbal, 0.0) AS DOUBLE) AS bal_floor0,
        CAST(least(c_acctbal, 1000.0) AS DOUBLE) AS bal_cap1k
      FROM customer ORDER BY c_custkey""",
    duckSql = """
      SELECT c_custkey,
        CASE WHEN c_acctbal < 0 THEN 'overdrawn' WHEN c_acctbal = 0 THEN 'zero'
             ELSE 'credit' END AS bal_class,
        coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked,
        CAST(greatest(c_acctbal, 0.0) AS DOUBLE) AS bal_floor0,
        CAST(least(c_acctbal, 1000.0) AS DOUBLE) AS bal_cap1k
      FROM customer ORDER BY c_custkey""")

  /** e08 — AS-OF join (an operator Spark lacks natively, composed per
    * SURVEY.md preference (a)): for each purchase, the latest click at or
    * before it per user. Spark: union both streams, carry the last click
    * forward with last(ignoreNulls) over an ordered per-user window — one
    * shuffle on user_id, no range explosion. DuckDB: native ASOF JOIN. */
  private val e08 = q(headline = true)(
    sparkSql = """
      WITH clicks AS (
        SELECT user_id, ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      purchases AS (
        SELECT event_id AS purchase_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'),
      merged AS (
        SELECT user_id, ts, 0 AS kind, click_id, NULL AS purchase_id, NULL AS value
        FROM clicks
        UNION ALL
        SELECT user_id, ts, 1 AS kind, NULL, purchase_id, value FROM purchases),
      carried AS (
        SELECT user_id, ts, kind, purchase_id, value,
          last(click_id, true) OVER (PARTITION BY user_id ORDER BY ts, kind, purchase_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id,
          last(CASE WHEN kind = 0 THEN ts END, true) OVER (PARTITION BY user_id ORDER BY ts, kind, purchase_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts
        FROM merged)
      SELECT purchase_id, user_id, ts AS purchase_ts, click_id, click_ts, value
      FROM carried WHERE kind = 1
      ORDER BY purchase_id""",
    duckSql = """
      WITH clicks AS (
        SELECT user_id, ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      purchases AS (
        SELECT event_id AS purchase_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase')
      SELECT p.purchase_id, p.user_id, p.ts AS purchase_ts,
        c.click_id, c.ts AS click_ts, p.value
      FROM purchases p ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY purchase_id""")

  /** e09 — range join: orders bucketed into inline half-year ranges
    * (non-equi BETWEEN join against a broadcast-tiny ranges relation). */
  private val e09 = q()(
    sparkSql = """
      SELECT r.label, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders JOIN (
        SELECT * FROM VALUES
          ('1994H2', DATE '1994-07-01', DATE '1994-12-31'),
          ('1995H1', DATE '1995-01-01', DATE '1995-06-30'),
          ('1995H2', DATE '1995-07-01', DATE '1995-12-31'),
          ('1996H1', DATE '1996-01-01', DATE '1996-06-30')
          AS t(label, d_start, d_end)) r
      ON CAST(o_orderdate AS DATE) BETWEEN r.d_start AND r.d_end
      GROUP BY r.label ORDER BY r.label""",
    duckSql = """
      SELECT r.label, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders JOIN (
        SELECT * FROM (VALUES
          ('1994H2', DATE '1994-07-01', DATE '1994-12-31'),
          ('1995H1', DATE '1995-01-01', DATE '1995-06-30'),
          ('1995H2', DATE '1995-07-01', DATE '1995-12-31'),
          ('1996H1', DATE '1996-01-01', DATE '1996-06-30'))
          t(label, d_start, d_end)) r
      ON CAST(o_orderdate AS DATE) BETWEEN r.d_start AND r.d_end
      GROUP BY r.label ORDER BY r.label""")

  /** e10 — JSON: construct a JSON document from columns, extract fields
    * back out (string + numeric paths). */
  private val e10 = q()(
    sparkSql = """
      SELECT o_orderkey,
        get_json_object(j, '$.status') AS status,
        CAST(get_json_object(j, '$.key') AS BIGINT) AS key_back
      FROM (SELECT o_orderkey,
              concat('{"status":"', o_orderstatus, '","key":', o_orderkey, '}') AS j
            FROM orders)
      ORDER BY o_orderkey""",
    duckSql = """
      SELECT o_orderkey,
        json_extract_string(j, '$.status') AS status,
        CAST(json_extract_string(j, '$.key') AS BIGINT) AS key_back
      FROM (SELECT o_orderkey,
              concat('{"status":"', o_orderstatus, '","key":', o_orderkey, '}') AS j
            FROM orders)
      ORDER BY o_orderkey""")

  /** e11 — exact interpolated percentiles (quantity is integer-valued and
    * the quartile fractions are exact binary, so interpolation is exact
    * in both engines). */
  private val e11 = q()(
    sparkSql = """
      SELECT l_returnflag,
        CAST(percentile(l_quantity, 0.25) AS DOUBLE) AS p25,
        CAST(percentile(l_quantity, 0.5) AS DOUBLE) AS p50,
        CAST(percentile(l_quantity, 0.75) AS DOUBLE) AS p75
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    duckSql = """
      SELECT l_returnflag,
        CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE) AS p25,
        CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS p50,
        CAST(quantile_cont(l_quantity, 0.75) AS DOUBLE) AS p75
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")

  /** e12 — deterministic moment statistics: mean/variance/stddev from
    * exact DECIMAL power sums (built-in stddev/var aggregate in any
    * engine is summation-order-dependent in the last bits; the decimal
    * power-sum form is order-independent, hence safe for distributed
    * partial aggregation AND for cross-engine comparison). */
  private val e12 = q()(
    sparkSql = """
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS mean,
        (CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
          - CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
            * CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*))
          / (count(*) - 1) AS variance,
        sqrt((CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
          - CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
            * CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*))
          / (count(*) - 1)) AS stddev
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    duckSql = """
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS mean,
        (CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
          - CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
            * CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*))
          / (count(*) - 1) AS variance,
        sqrt((CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
          - CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
            * CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*))
          / (count(*) - 1)) AS stddev
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")

  /** e13 — batch gap-sessionization (the batch twin of the streaming
    * flatMapGroupsWithState sessionizer): 30-min event-time gap starts a
    * new session; lag + cumulative flag sum assigns session ids.
    *
    * The gap test compares second-TRUNCATED timestamps — exact parity with
    * the oracle's `datediff('second', …) > 1800` (boundary count), which the
    * data exercises: every event carries µs precision, so a full-precision
    * interval compare would move session boundaries. Written against the
    * timestamp type (date_trunc + interval, not CAST AS LONG) so it analyzes
    * whether ts arrives as TimestampType or TIMESTAMP_NTZ. */
  private val e13 = q(headline = true)(
    sparkSql = """
      WITH flagged AS (
        SELECT user_id, event_id, ts, value,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR date_trunc('SECOND', ts)
                    > date_trunc('SECOND', lag(ts) OVER w) + INTERVAL '30' MINUTE
               THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      numbered AS (
        SELECT user_id, event_id, ts, value,
          sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        CAST(count(*) AS BIGINT) AS n_events,
        min(ts) AS session_start, max(ts) AS session_end,
        CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM numbered GROUP BY user_id, session_id
      ORDER BY user_id, session_id""",
    duckSql = """
      WITH flagged AS (
        SELECT user_id, event_id, ts, value,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR datediff('second', lag(ts) OVER w, ts) > 1800
               THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      numbered AS (
        SELECT user_id, event_id, ts, value,
          sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        CAST(count(*) AS BIGINT) AS n_events,
        min(ts) AS session_start, max(ts) AS session_end,
        CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM numbered GROUP BY user_id, session_id
      ORDER BY user_id, session_id""")

  /** e14 — sorted array aggregation: collect_list → sort_array, emitted
    * as a joined string so the compare is representation-proof across
    * engines' array stringification. */
  private val e14 = q()(
    sparkSql = """
      SELECT c_nationkey,
        array_join(sort_array(collect_list(c_mktsegment)), '|') AS segs,
        CAST(size(sort_array(collect_list(c_mktsegment))) AS BIGINT) AS n
      FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
      GROUP BY c_nationkey ORDER BY c_nationkey""",
    duckSql = """
      SELECT c_nationkey,
        array_to_string(list_sort(list(c_mktsegment)), '|') AS segs,
        CAST(len(list_sort(list(c_mktsegment))) AS BIGINT) AS n
      FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
      GROUP BY c_nationkey ORDER BY c_nationkey""")

  /** e15 — extended window functions: dense_rank, ntile, percent_rank,
    * cume_dist, lead, first/nth value over per-segment balance order. */
  private val e15 = q()(
    sparkSql = """
      SELECT c_custkey, c_mktsegment,
        CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        percent_rank() OVER w AS prnk,
        cume_dist() OVER w AS cdist,
        lead(c_custkey, 1) OVER w AS next_cust,
        first_value(c_custkey) OVER w AS top_cust
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      ORDER BY c_mktsegment, drnk, c_custkey""",
    duckSql = """
      SELECT c_custkey, c_mktsegment,
        CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        percent_rank() OVER w AS prnk,
        cume_dist() OVER w AS cdist,
        lead(c_custkey, 1) OVER w AS next_cust,
        first_value(c_custkey) OVER w AS top_cust
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      ORDER BY c_mktsegment, drnk, c_custkey""")

  /** e16 — string function battery: regexp_extract, pad, trim, translate,
    * repeat, reverse, position, case mapping. */
  private val e16 = q()(
    sparkSql = """
      SELECT c_custkey,
        regexp_extract(c_name, '([0-9]+)', 1) AS name_num,
        lpad(CAST(c_custkey AS STRING), 8, '0') AS padded,
        translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
        reverse(c_mktsegment) AS rev,
        repeat('ab', 3) AS rep,
        CAST(instr(c_name, '#') AS BIGINT) AS hash_pos,
        lower(c_mktsegment) AS seg_lower,
        trim('  x  ') AS trimmed
      FROM customer ORDER BY c_custkey""",
    duckSql = """
      SELECT c_custkey,
        regexp_extract(c_name, '([0-9]+)', 1) AS name_num,
        lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
        reverse(c_mktsegment) AS rev,
        repeat('ab', 3) AS rep,
        CAST(instr(c_name, '#') AS BIGINT) AS hash_pos,
        lower(c_mktsegment) AS seg_lower,
        trim('  x  ') AS trimmed
      FROM customer ORDER BY c_custkey""")

  /** e17 — scalar subquery + IN subquery: orders above the global mean
    * price from AUTOMOBILE-segment customers. */
  private val e17 = q()(
    sparkSql = """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                              / count(*) FROM orders)
        AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
      ORDER BY o_orderkey""",
    duckSql = """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                              / count(*) FROM orders)
        AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
      ORDER BY o_orderkey""")

  /** e18 — struct construction + field access round-trip (output kept to
    * scalar columns so the cross-engine compare is representation-proof;
    * the struct is built and accessed inside the query). */
  private val e18 = q()(
    sparkSql = """
      SELECT o_orderkey,
        named_struct('status', o_orderstatus, 'priority', o_orderpriority).status AS status_back,
        named_struct('status', o_orderstatus, 'priority', o_orderpriority).priority AS priority_back
      FROM orders ORDER BY o_orderkey""",
    duckSql = """
      SELECT o_orderkey,
        struct_pack(status := o_orderstatus, priority := o_orderpriority).status AS status_back,
        struct_pack(status := o_orderstatus, priority := o_orderpriority).priority AS priority_back
      FROM orders ORDER BY o_orderkey""")

  /** e19 — array higher-order functions as query surface: exists, forall,
    * fold (portable filter-count forms on the oracle side). */
  private val e19 = q()(
    sparkSql = """
      SELECT doc_id,
        exists(split(text, ' '), w -> length(w) > 8) AS has_long,
        forall(split(text, ' '), w -> length(w) >= 1) AS all_nonempty,
        CAST(aggregate(transform(split(text, ' '), w -> length(w)), 0, (a, x) -> a + x) AS BIGINT) AS total_len
      FROM documents ORDER BY doc_id""",
    duckSql = """
      SELECT doc_id,
        len(list_filter(string_split(text, ' '), w -> length(w) > 8)) > 0 AS has_long,
        len(list_filter(string_split(text, ' '), w -> length(w) < 1)) = 0 AS all_nonempty,
        CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS BIGINT) AS total_len
      FROM documents ORDER BY doc_id""")

  /** e20 — multiple DISTINCT aggregates in one pass (Catalyst Expand). */
  private val e20 = q()(
    sparkSql = """
      SELECT l_returnflag,
        CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_dist_qty,
        CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    duckSql = """
      SELECT l_returnflag,
        CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_dist_qty,
        CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")

  /** e21 — RANGE window frame over a numeric order (value-based frame,
    * not row-based; decimal running sums). */
  private val e21 = q()(
    sparkSql = """
      SELECT o_custkey, o_orderkey, o_totalprice,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
          PARTITION BY o_custkey ORDER BY o_totalprice
          RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_sum
      FROM orders ORDER BY o_custkey, o_orderkey""",
    duckSql = """
      SELECT o_custkey, o_orderkey, o_totalprice,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
          PARTITION BY o_custkey ORDER BY o_totalprice
          RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_sum
      FROM orders ORDER BY o_custkey, o_orderkey""")

  /** e22 — ordered string aggregation (listagg/string_agg equivalent,
    * canonicalized by sorting the distinct inputs). */
  private val e22 = q()(
    sparkSql = """
      SELECT c_nationkey,
        array_join(sort_array(collect_list(c_mktsegment)), ',') AS segs
      FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
      GROUP BY c_nationkey ORDER BY c_nationkey""",
    duckSql = """
      SELECT c_nationkey,
        string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segs
      FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
      GROUP BY c_nationkey ORDER BY c_nationkey""")

  /** e23 — regex replace / split_part / prefix-suffix predicates. */
  private val e23 = q()(
    sparkSql = """
      SELECT c_custkey,
        regexp_replace(c_name, '[0-9]', '#') AS masked,
        split_part(c_name, '#', 1) AS name_head,
        startswith(c_mktsegment, 'BU') AS is_bu,
        endswith(c_mktsegment, 'RY') AS ends_ry,
        contains(c_name, '1') AS has_one
      FROM customer ORDER BY c_custkey""",
    duckSql = """
      SELECT c_custkey,
        regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
        split_part(c_name, '#', 1) AS name_head,
        starts_with(c_mktsegment, 'BU') AS is_bu,
        ends_with(c_mktsegment, 'RY') AS ends_ry,
        contains(c_name, '1') AS has_one
      FROM customer ORDER BY c_custkey""")

  /** e24 — lateral explode to rows (LATERAL VIEW ≡ unnest-in-select). */
  private val e24 = q()(
    sparkSql = """
      SELECT doc_id, tok
      FROM documents LATERAL VIEW explode(split(text, ' ')) t AS tok
      WHERE doc_id < 20 ORDER BY doc_id, tok""",
    duckSql = """
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id < 20 ORDER BY doc_id, tok""")

  /** e25 — timestamp field extraction + epoch seconds (truncating). */
  private val e25 = q()(
    sparkSql = """
      SELECT event_id,
        CAST(extract(HOUR FROM ts) AS BIGINT) AS h,
        CAST(extract(MINUTE FROM ts) AS BIGINT) AS m,
        unix_timestamp(ts) AS epoch_s
      FROM events ORDER BY event_id""",
    duckSql = """
      SELECT event_id,
        CAST(extract('hour' FROM ts) AS BIGINT) AS h,
        CAST(extract('minute' FROM ts) AS BIGINT) AS m,
        CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
      FROM events ORDER BY event_id""")

  /** e26 — correlated scalar subquery: orders above their own customer's
    * average (Catalyst decorrelates this into an aggregate + join; the
    * plan has no per-row subquery execution). */
  private val e26 = q()(
    sparkSql = """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders o
      WHERE o_totalprice > (
        SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*)
        FROM orders i WHERE i.o_custkey = o.o_custkey)
      ORDER BY o_orderkey""",
    duckSql = """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders o
      WHERE o_totalprice > (
        SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*)
        FROM orders i WHERE i.o_custkey = o.o_custkey)
      ORDER BY o_orderkey""")

  /** e27 — time-series resample with gap fill: a dense hourly grid per
    * event type (sequence/generate_series), left-joined against hourly
    * aggregates, empty buckets filled with zero. */
  private val e27 = q()(
    sparkSql = """
      WITH bounds AS (
        SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
        FROM events),
      grid AS (
        SELECT t.event_type, g.h
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT explode(sequence(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds) g),
      agg AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM events GROUP BY event_type, date_trunc('hour', ts))
      SELECT grid.event_type, grid.h AS hour,
        coalesce(agg.n, 0) AS n, coalesce(agg.total, 0.0) AS total
      FROM grid LEFT JOIN agg ON grid.event_type = agg.event_type AND grid.h = agg.h
      ORDER BY 1, 2""",
    duckSql = """
      WITH bounds AS (
        SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
        FROM events),
      grid AS (
        SELECT t.event_type, g.h
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds) g),
      agg AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM events GROUP BY event_type, date_trunc('hour', ts))
      SELECT grid.event_type, grid.h AS hour,
        coalesce(agg.n, 0) AS n, coalesce(agg.total, 0.0) AS total
      FROM grid LEFT JOIN agg ON grid.event_type = agg.event_type AND grid.h = agg.h
      ORDER BY 1, 2""")

  /** e28 — GROUPING SETS with grouping() disambiguation: order counts
    * by (segment, nation), by segment alone, and the grand total in one
    * pass (one shuffle; Spark plans an Expand over the grouping sets,
    * not three scans). grouping() markers distinguish "NULL because
    * rolled up" from a genuinely NULL group key — the correctness trap
    * grouping-set reports hit in production. */
  private val e28 = q()(
    sparkSql = """
      SELECT c_mktsegment, c_nationkey,
        CAST(grouping(c_mktsegment) AS BIGINT) AS g_seg,
        CAST(grouping(c_nationkey) AS BIGINT) AS g_nat,
        CAST(count(*) AS BIGINT) AS n
      FROM customer
      GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey), (c_mktsegment), ())
      ORDER BY g_seg, g_nat, c_mktsegment, c_nationkey""",
    duckSql = """
      SELECT c_mktsegment, c_nationkey,
        CAST(grouping(c_mktsegment) AS BIGINT) AS g_seg,
        CAST(grouping(c_nationkey) AS BIGINT) AS g_nat,
        CAST(count(*) AS BIGINT) AS n
      FROM customer
      GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey), (c_mktsegment), ())
      ORDER BY g_seg, g_nat, c_mktsegment, c_nationkey""")

  /** e29 — error-tolerant parsing with try_cast: the dirty-input
    * contract (a malformed value yields NULL, never a failed job — at
    * 100 TB a single bad row must not kill a stage). The fixture derives
    * a sometimes-unparseable string from order ids deterministically;
    * the report counts parsed/failed per bucket and aggregates only the
    * parsed values. */
  private val e29 = q()(
    sparkSql = """
      WITH raw AS (
        SELECT o_orderkey,
          CASE WHEN o_orderkey % 7 = 0 THEN concat('x', CAST(o_orderkey AS STRING))
               ELSE CAST(o_orderkey % 1000 AS STRING) END AS val_str
        FROM orders),
      p AS (SELECT o_orderkey, val_str, try_cast(val_str AS BIGINT) AS v FROM raw)
      SELECT CAST(o_orderkey % 10 AS BIGINT) AS bucket,
        CAST(count(*) AS BIGINT) AS n_rows,
        CAST(count(v) AS BIGINT) AS n_parsed,
        CAST(count(*) - count(v) AS BIGINT) AS n_failed,
        CAST(sum(v) AS BIGINT) AS parsed_sum
      FROM p GROUP BY o_orderkey % 10
      ORDER BY bucket""",
    duckSql = """
      WITH raw AS (
        SELECT o_orderkey,
          CASE WHEN o_orderkey % 7 = 0 THEN concat('x', CAST(o_orderkey AS VARCHAR))
               ELSE CAST(o_orderkey % 1000 AS VARCHAR) END AS val_str
        FROM orders),
      p AS (SELECT o_orderkey, val_str, try_cast(val_str AS BIGINT) AS v FROM raw)
      SELECT CAST(o_orderkey % 10 AS BIGINT) AS bucket,
        CAST(count(*) AS BIGINT) AS n_rows,
        CAST(count(v) AS BIGINT) AS n_parsed,
        CAST(count(*) - count(v) AS BIGINT) AS n_failed,
        CAST(sum(v) AS BIGINT) AS parsed_sum
      FROM p GROUP BY o_orderkey % 10
      ORDER BY bucket""")

  /** e30 — SCD Type-2 dimension history: the events stream of per-user
    * attribute updates becomes validity-interval rows (valid_from /
    * valid_to, version, is_current) with no-change updates collapsed —
    * the warehouse-history capability the reference's overwrite-only
    * star (SCD-0/1) lacks. Change detection is lag() per user in event
    * time (event_id tie-break → fully deterministic); intervals come
    * from lead() over the surviving change rows. One shuffle on
    * user_id; both windows share the partitioning. */
  private val e30 = q()(
    sparkSql = """
      WITH u AS (
        SELECT user_id, event_id, ts, CAST(value AS DOUBLE) AS v,
          lag(CAST(value AS DOUBLE)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v
        FROM events WHERE event_type = 'signup'),
      c AS (SELECT user_id, event_id, ts, v FROM u WHERE prev_v IS NULL OR v <> prev_v),
      h AS (
        SELECT user_id, v, ts AS valid_from,
          lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
          CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version
        FROM c)
      SELECT user_id, version, v AS value, valid_from, valid_to,
        CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
      FROM h ORDER BY user_id, version""",
    duckSql = """
      WITH u AS (
        SELECT user_id, event_id, ts, CAST(value AS DOUBLE) AS v,
          lag(CAST(value AS DOUBLE)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v
        FROM events WHERE event_type = 'signup'),
      c AS (SELECT user_id, event_id, ts, v FROM u WHERE prev_v IS NULL OR v <> prev_v),
      h AS (
        SELECT user_id, v, ts AS valid_from,
          lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
          CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version
        FROM c)
      SELECT user_id, version, v AS value, valid_from, valid_to,
        CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
      FROM h ORDER BY user_id, version""")

  val all: Map[String, GQuery] = Map(
    "e01_pivot" -> e01,
    "e02_cube" -> e02,
    "e03_full_outer_join" -> e03,
    "e04_cross_join" -> e04,
    "e05_wordcount_explode" -> e05,
    "e06_date_math" -> e06,
    "e07_conditional_funcs" -> e07,
    "e08_asof_join" -> e08,
    "e09_range_join" -> e09,
    "e10_json_extract" -> e10,
    "e11_percentiles" -> e11,
    "e12_moment_stats" -> e12,
    "e13_sessionize" -> e13,
    "e14_array_agg" -> e14,
    "e15_window_battery" -> e15,
    "e16_string_funcs" -> e16,
    "e17_scalar_subquery" -> e17,
    "e18_struct_access" -> e18,
    "e19_array_hofs" -> e19,
    "e20_multi_distinct" -> e20,
    "e21_range_frame" -> e21,
    "e22_string_agg" -> e22,
    "e23_regex_predicates" -> e23,
    "e24_lateral_explode" -> e24,
    "e25_ts_extract" -> e25,
    "e26_correlated_subquery" -> e26,
    "e27_resample_gapfill" -> e27,
    "e28_grouping_sets" -> e28,
    "e29_try_cast" -> e29,
    "e30_scd2_history" -> e30)
}
