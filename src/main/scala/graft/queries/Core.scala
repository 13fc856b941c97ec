package graft.queries

import graft.{GQuery, Tables}
import graft.operators.Relational._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator coverage (SURVEY.md §2.1–§2.10) expressed over
  * the driver testdata tables, each with a DuckDB oracle.
  *
  * Operator-family map (reference file:line cites in SURVEY.md):
  *  - scans/projection/filter/pushdown: q02, q24   (S1/S5, P1/P2/P4/P5)
  *  - aggregation: q01, q05, q11, q19, q22         (A1/A4 + general aggs)
  *  - skew handling: q23 salted two-phase aggregation
  *  - dedup: q06 keep-last (A2/W3), q07 distinct (A3)
  *  - joins: q03/q04 broadcast lookups (J1–J5), q05 large shuffle join
  *  - windows/surrogate keys: q08/q09 (W1/W2), q10 top-k, q20 frames
  *  - sorts/limits: q11 (O2/O4); set ops: q14/q15/q16/q17 (U-family)
  *  - melt/unpivot: q13 (R1); date/time scalar funcs: q08/q09/q18 (F1–F8)
  *  - micro-batch/incremental semantics: q24 watermark filter (P2/P3),
  *    q25 tumbling event-time window (§2.10)
  */
object Core {

  /** TPC-H Q1-style pricing summary: filter + hash aggregate with exact
    * decimal money sums (map-side partial agg; scan prunes to 7 columns). */
  private val q01 = GQuery(
    fn = (s, d) => {
      val li = Tables.lineitem(s, d)
      val disc  = money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))
      li.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("2001-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(money(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(money(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(disc).cast("double").as("sum_disc_price"),
          sum(disc * (lit(1) + money(col("l_tax")))).cast("double").as("sum_charge"),
          (sum(money(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(money(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
          (sum(money(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    oracle = Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        CAST(COUNT(*) AS BIGINT) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    headline = true)

  /** Projection + rename + pushed-down predicate (reference P1/P2/P4/P5).
    * `.explain` shows PushedFilters + a 4-column ReadSchema. */
  private val q02 = GQuery(
    fn = (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 45 && col("l_returnflag") === "R")
        .select(
          col("l_orderkey").as("orderkey"),
          col("l_linenumber").as("linenumber"),
          col("l_quantity").as("quantity"),
          col("l_extendedprice").as("price"))
        .orderBy(col("orderkey"), col("linenumber")),
    oracle = Some("""
      SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
             l_quantity AS quantity, l_extendedprice AS price
      FROM lineitem
      WHERE l_quantity >= 45 AND l_returnflag = 'R'
      ORDER BY orderkey, linenumber"""))

  /** Small broadcast lookup join (reference J1/J2 intended key semantics). */
  private val q03 = GQuery(
    fn = (s, d) => {
      val nation = Tables.nation(s, d)
      val region = Tables.region(s, d)
        .select(col("r_regionkey").as("n_regionkey"), col("r_name").as("region_name"))
      lookupJoin(region, Seq("n_regionkey"))(nation)
        .select(col("n_nationkey"), col("n_name"), col("region_name"))
        .orderBy(col("n_nationkey"))
    },
    oracle = Some("""
      SELECT n_nationkey, n_name, r_name AS region_name
      FROM nation LEFT JOIN region ON n_regionkey = r_regionkey
      ORDER BY n_nationkey"""))

  /** Chained dimension-enrichment broadcast joins (customer→nation→region),
    * the Spark shape of the reference's dim_staff/dim_counterparty builds. */
  private val q04 = GQuery(
    fn = (s, d) => {
      val cust = Tables.customer(s, d)
      val nation = Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nationkey"), col("n_name").as("nation_name"),
          col("n_regionkey"))
      val region = Tables.region(s, d)
        .select(col("r_regionkey").as("n_regionkey"), col("r_name").as("region_name"))
      lookupJoin(region, Seq("n_regionkey"))(lookupJoin(nation, Seq("c_nationkey"))(cust))
        .select(col("c_custkey"), col("c_name"), col("nation_name"), col("region_name"),
          col("c_acctbal"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    oracle = Some("""
      SELECT c_custkey, c_name, n_name AS nation_name, r_name AS region_name,
             c_acctbal, c_mktsegment
      FROM customer
      LEFT JOIN nation ON c_nationkey = n_nationkey
      LEFT JOIN region ON n_regionkey = r_regionkey
      ORDER BY c_custkey"""),
    headline = true)

  /** Large-large equi-join + aggregate. At scale this is a shuffle join on
    * l_orderkey/o_orderkey; AQE handles skew. Exact decimal revenue. */
  private val q05 = GQuery(
    fn = (s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          countDistinct(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_lines"),
          sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
            .cast("double").as("revenue"))
        .orderBy(col("o_orderpriority"))
    },
    oracle = Some("""
      SELECT o_orderpriority,
        CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        CAST(COUNT(*) AS BIGINT) AS n_lines,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""),
    headline = true)

  /** Keep-last dedup per key with an explicit total version order
    * (reference A2/W3 made deterministic; SURVEY.md §2.4). */
  private val q06 = GQuery(
    fn = (s, d) =>
      dedupKeepLast(Seq("user_id", "event_type"), Seq(col("ts"), col("event_id")))(
        Tables.events(s, d))
        .select(col("user_id"), col("event_type"), col("event_id"), col("ts"), col("value"))
        .orderBy(col("user_id"), col("event_type")),
    oracle = Some("""
      SELECT user_id, event_type, event_id, ts, value
      FROM events
      QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts DESC, event_id DESC) = 1
      ORDER BY user_id, event_type"""),
    headline = true)

  /** Whole-row DISTINCT (reference A3). */
  private val q07 = GQuery(
    fn = (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderpriority"))
        .distinct()
        .orderBy(col("o_orderstatus"), col("o_orderpriority")),
    oracle = Some("""
      SELECT DISTINCT o_orderstatus, o_orderpriority
      FROM orders ORDER BY o_orderstatus, o_orderpriority"""))

  /** The reference's dim_date build end-to-end (make_dim_dates,
    * src/process_lambda.py:209-242): melt date columns → union → parse →
    * distinct → sort → dense surrogate id (W1) → 7 calendar parts (F4–F7,
    * Monday=0 weekday). */
  private val q08 = GQuery(
    fn = (s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderdate").as("d"))
      val l = Tables.lineitem(s, d).select(col("l_shipdate").as("d"))
      val dates = o.unionByName(l).select(to_date(col("d")).as("date")).distinct()
      withDateParts("date")(sequentialId("date_id", Seq(col("date")))(dates))
        .select(col("date_id"), col("date"), col("year"), col("month"), col("day"),
          col("day_of_week"), col("day_name"), col("month_name"), col("quarter"))
        .orderBy(col("date_id"))
    },
    oracle = Some("""
      WITH dates AS (
        SELECT DISTINCT CAST(d AS DATE) AS date FROM (
          SELECT o_orderdate AS d FROM orders
          UNION ALL SELECT l_shipdate FROM lineitem))
      SELECT CAST(row_number() OVER (ORDER BY date) AS BIGINT) AS date_id,
        date,
        CAST(year(date) AS BIGINT) AS year,
        CAST(month(date) AS BIGINT) AS month,
        CAST(day(date) AS BIGINT) AS day,
        CAST(isodow(date) - 1 AS BIGINT) AS day_of_week,
        dayname(date) AS day_name,
        monthname(date) AS month_name,
        CAST(quarter(date) AS BIGINT) AS quarter
      FROM dates ORDER BY date_id"""),
    headline = true)

  /** Fact-table build over events: arrival-order surrogate key (W2),
    * timestamp split into date FK + µs time string (F2/F3), broadcast
    * date-dimension lookup (J3–J5 shape). */
  private val q09 = GQuery(
    fn = (s, d) => {
      val ev = Tables.events(s, d)
      val dd = sequentialId("date_id", Seq(col("d")))(
        ev.select(to_date(col("ts")).as("d")).distinct())
      val fact = splitTimestamp("ts", "event_date", "event_time")(ev)
      sequentialId("record_id", Seq(col("event_id")))(
        lookupJoin(dd.withColumnRenamed("d", "event_date"), Seq("event_date"))(fact))
        .select(col("record_id"), col("event_id"), col("date_id").as("event_date_id"),
          col("event_time"), col("user_id"), col("event_type"), col("value"))
        .orderBy(col("record_id"))
    },
    oracle = Some("""
      WITH dd AS (
        SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS date_id, d
        FROM (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events))
      SELECT CAST(row_number() OVER (ORDER BY event_id) AS BIGINT) AS record_id,
        event_id, dd.date_id AS event_date_id,
        strftime(ts, '%H:%M:%S.%f') AS event_time,
        user_id, event_type, value
      FROM events LEFT JOIN dd ON CAST(ts AS DATE) = dd.d
      ORDER BY record_id"""))

  /** Top-k per group via window rank-filter. */
  private val q10 = GQuery(
    fn = (s, d) =>
      topKPerGroup(Seq("o_custkey"), Seq(col("o_totalprice").desc, col("o_orderkey")), 3)(
        Tables.orders(s, d))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
        .orderBy(col("o_custkey"), col("rnk")),
    oracle = Some("""
      SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS BIGINT) AS rnk
      FROM (SELECT o_custkey, o_orderkey, o_totalprice,
              row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS rnk
            FROM orders)
      WHERE rnk <= 3
      ORDER BY o_custkey, rnk"""))

  /** Global top-k by aggregate (sort + limit, reference O2/O4 family). */
  private val q11 = GQuery(
    fn = (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(
          sum(money(col("o_totalprice"))).cast("double").as("total_spend"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("total_spend").desc, col("o_custkey"))
        .limit(10),
    oracle = Some("""
      SELECT o_custkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend,
        CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey
      ORDER BY total_spend DESC, o_custkey LIMIT 10"""))

  /** UNION ALL of heterogeneous inputs + aggregate (reference U1/U2). */
  private val q12 = GQuery(
    fn = (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(lit("lineitem").as("src"), col("l_extendedprice").as("amount"))
      val o = Tables.orders(s, d)
        .select(lit("orders").as("src"), col("o_totalprice").as("amount"))
      li.unionByName(o)
        .groupBy(col("src"))
        .agg(count(lit(1)).as("n"), sum(money(col("amount"))).cast("double").as("total"))
        .orderBy(col("src"))
    },
    oracle = Some("""
      SELECT src, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(amount AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM (SELECT 'lineitem' AS src, l_extendedprice AS amount FROM lineitem
            UNION ALL SELECT 'orders', o_totalprice FROM orders)
      GROUP BY src ORDER BY src"""))

  /** Unpivot/melt to long form (reference R1; native `unpivot` = Expand,
    * no shuffle). Metric labels are the source column names. */
  private val q13 = GQuery(
    fn = (s, d) =>
      melt(Seq("l_orderkey", "l_linenumber"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"), "metric", "value")(
        Tables.lineitem(s, d))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric")),
    oracle = Some("""
      SELECT l_orderkey, l_linenumber, metric, value FROM (
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
      ORDER BY l_orderkey, l_linenumber, metric"""))

  /** INTERSECT (distinct set semantics). */
  private val q14 = GQuery(
    fn = (s, d) =>
      Tables.customer(s, d)
        .filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey"))
        .intersect(Tables.orders(s, d).select(col("o_custkey").as("c_custkey")))
        .orderBy(col("c_custkey")),
    oracle = Some("""
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      INTERSECT SELECT o_custkey FROM orders
      ORDER BY c_custkey"""))

  /** EXCEPT (distinct set semantics): customers with no orders. */
  private val q15 = GQuery(
    fn = (s, d) =>
      Tables.customer(s, d).select(col("c_custkey"))
        .except(Tables.orders(s, d).select(col("o_custkey").as("c_custkey")))
        .orderBy(col("c_custkey")),
    oracle = Some("""
      SELECT c_custkey FROM customer
      EXCEPT SELECT o_custkey FROM orders
      ORDER BY c_custkey"""))

  /** Left-semi join (EXISTS). */
  private val q16 = GQuery(
    fn = (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
    oracle = Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey"""))

  /** Left-anti join (NOT EXISTS). */
  private val q17 = GQuery(
    fn = (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey")),
    oracle = Some("""
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey"""))

  /** Timestamp → (date, µs time-of-day string) split (reference F2/F3). */
  private val q18 = GQuery(
    fn = (s, d) =>
      splitTimestamp("ts", "event_date", "event_time")(Tables.events(s, d))
        .select(col("event_id"), col("event_date"), col("event_time"))
        .orderBy(col("event_id")),
    oracle = Some("""
      SELECT event_id, CAST(ts AS DATE) AS event_date,
             strftime(ts, '%H:%M:%S.%f') AS event_time
      FROM events ORDER BY event_id"""))

  /** ROLLUP grouping-sets aggregate (Catalyst Expand + partial agg). */
  private val q19 = GQuery(
    fn = (s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(money(col("l_quantity"))).cast("double").as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("qty"))
        .orderBy(col("returnflag"), col("linestatus")),
    oracle = Some("""
      SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             COALESCE(l_linestatus, 'ALL') AS linestatus,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus"""))

  /** Window frames: running counts/sums + lag over per-user event history.
    * Running sum in DECIMAL so segment-tree vs streaming evaluation both
    * give exact results. */
  private val q20 = GQuery(
    fn = (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("running_n", count(lit(1)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("running_value", sum(money(col("value"))).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("double"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .select(col("user_id"), col("event_id"), col("rn"), col("running_n"),
          col("running_value"), col("prev_type"))
        .orderBy(col("user_id"), col("rn"))
    },
    oracle = Some("""
      SELECT user_id, event_id,
        CAST(row_number() OVER w AS BIGINT) AS rn,
        CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_n,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
        lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, rn"""),
    headline = true)

  /** Scalar string/math functions (deterministic subset: no libm). */
  private val q21 = GQuery(
    fn = (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_type"), 1, 5).as("type5"),
          length(col("p_name")).cast("long").as("name_len"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
          abs(col("p_size") - lit(25)).cast("long").as("size_dist"),
          (col("p_size") % 7).cast("long").as("size_mod"),
          floor(col("p_retailprice")).cast("long").as("price_floor"),
          ceil(col("p_retailprice")).cast("long").as("price_ceil"),
          when(col("p_size") > 25, lit("large")).otherwise(lit("small")).as("size_class"))
        .orderBy(col("p_partkey")),
    oracle = Some("""
      SELECT p_partkey, upper(p_name) AS uname, substr(p_type, 1, 5) AS type5,
        CAST(length(p_name) AS BIGINT) AS name_len,
        p_brand || '#' || p_type AS brand_type,
        CAST(abs(p_size - 25) AS BIGINT) AS size_dist,
        CAST(p_size % 7 AS BIGINT) AS size_mod,
        CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
        CASE WHEN p_size > 25 THEN 'large' ELSE 'small' END AS size_class
      FROM part ORDER BY p_partkey"""))

  /** GROUP BY + HAVING on an aggregate. */
  private val q22 = GQuery(
    fn = (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"), max(col("o_orderdate")).as("last_order"))
        .filter(col("n") >= 15)
        .orderBy(col("o_custkey")),
    oracle = Some("""
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n, max(o_orderdate) AS last_order
      FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
      ORDER BY o_custkey"""))

  /** Two-phase SALTED aggregation over the biggest table — the explicit
    * skew-spreading form of [[saltedSum]] (one hot key no longer lands on
    * one reducer; partials merge per key). Result-identical to a plain
    * GROUP BY by algebraic reassociativity — which is exactly what the
    * oracle checks (sums in DECIMAL so the reassociation is exact). */
  private val q23 = GQuery(
    fn = (s, d) => {
      val li = Tables.lineitem(s, d)
        .withColumn("sum_qty", money(col("l_quantity")))
        .withColumn("sum_price", money(col("l_extendedprice")))
      saltedSum(Seq("l_returnflag"), 16, Seq("sum_qty", "sum_price"))(li)
        .select(col("l_returnflag"),
          col("sum_qty").cast("double").as("sum_qty"),
          col("sum_price").cast("double").as("sum_price"),
          col("n"))
        .orderBy(col("l_returnflag"))
    },
    oracle = Some("""
      SELECT l_returnflag,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Incremental watermark filter (reference P2/P3: rows newer than the
    * stored high-watermark; predicate pushed to the scan). */
  private val q24 = GQuery(
    fn = (s, d) =>
      Tables.events(s, d)
        .filter(col("ts") > lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), max(col("ts")).as("max_ts"))
        .orderBy(col("event_type")),
    oracle = Some("""
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, max(ts) AS max_ts
      FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
      GROUP BY event_type ORDER BY event_type"""))

  /** Tumbling event-time window aggregate — the batch shape of the
    * Structured Streaming pipeline in graft.streaming (SURVEY.md §2.10). */
  private val q25 = GQuery(
    fn = (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(money(col("value"))).cast("double").as("total"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total"))
        .orderBy(col("window_start"), col("event_type")),
    oracle = Some("""
      SELECT date_trunc('hour', ts) AS window_start, event_type,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"""),
    headline = true)

  val all: Map[String, GQuery] = Map(
    "q01_pricing_summary" -> q01,
    "q02_filter_project" -> q02,
    "q03_lookup_join" -> q03,
    "q04_enrich_customer" -> q04,
    "q05_big_join_agg" -> q05,
    "q06_dedup_keeplast" -> q06,
    "q07_distinct" -> q07,
    "q08_dim_date" -> q08,
    "q09_fact_events" -> q09,
    "q10_topk_per_group" -> q10,
    "q11_global_topk" -> q11,
    "q12_union_agg" -> q12,
    "q13_unpivot" -> q13,
    "q14_intersect" -> q14,
    "q15_except" -> q15,
    "q16_semi_join" -> q16,
    "q17_anti_join" -> q17,
    "q18_time_split" -> q18,
    "q19_rollup" -> q19,
    "q20_window_frames" -> q20,
    "q21_scalar_funcs" -> q21,
    "q22_having" -> q22,
    "q23_salted_agg" -> q23,
    "q24_incremental_filter" -> q24,
    "q25_tumbling_window" -> q25)
}
