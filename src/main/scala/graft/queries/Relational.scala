package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.tables.TableOps
import QueryDef.tbl

/** The relational surface the reference exercises inside node functions
  * (SURVEY.md §2.3), re-expressed as declarative Spark plans.
  *
  * Determinism conventions (the driver hash-compares against DuckDB):
  *  - money aggregates go through exact DECIMAL accumulation, cast to DOUBLE
  *    at the end (`dsum`) — immune to float summation-order differences;
  *  - every query has a total ORDER BY with a unique tiebreaker;
  *  - timestamps are emitted as epoch BIGINT (events.ts is ns-precision
  *    parquet, which Spark reads as long via `nanosAsLong` — see
  *    SURVEY.md §7.4.6).
  *
  * Scale notes are per-query; the common rules: dimension joins broadcast,
  * aggregations rely on map-side partial agg, filters/projections sit
  * directly on the scan so parquet pushdown + column pruning apply.
  */
object Relational {

  /** Exact decimal sum surfaced as double: deterministic under any partition
    * / summation order, unlike a plain double sum. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  private def dec(c: Column, scale: Int = 2): Column = c.cast(DecimalType(18, scale))

  val NsPerHour = 3600L * 1000000000L

  val all: Seq[QueryDef] = Seq(

    // ---- aggregation --------------------------------------------------
    // TPC-H Q1-shaped scan+agg: 2 grouping cols, partial agg map-side, one
    // shuffle over a tiny key space. At 100 TB this is scan-bound; decimal
    // accumulation keeps it deterministic.
    QueryDef(
      "q01_groupby_sum",
      (s, dir) => tbl(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |COUNT(*) AS count_order
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    ),

    // Filter + projection: both reach the parquet scan (PushedFilters +
    // 4-column ReadSchema) — W3/filter_stream semantics.
    QueryDef(
      "q02_filter_project",
      (s, dir) => TableOps.filterStream(
          tbl(s, dir, "lineitem"), $"l_quantity" >= 49, $"l_discount" <= 0.01)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem WHERE l_quantity >= 49 AND l_discount <= 0.01
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
    ),

    // Equi inner join + agg (the ETF join pattern,
    // reference examples/pyarrow_concepts.py:64-74). customer is the small
    // side — broadcast it so orders never shuffles.
    QueryDef(
      "q03_join_agg",
      (s, dir) => tbl(s, dir, "orders")
        .join(broadcast(tbl(s, dir, "customer")), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("order_cnt"), dsum($"o_totalprice").as("total_price"))
        .orderBy($"c_mktsegment"),
      Some("""SELECT c_mktsegment, COUNT(*) AS order_cnt,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
    ),

    // Star-schema rollup through 3 broadcast dimension joins — the fact
    // table streams through map-side; single shuffle for the final group.
    QueryDef(
      "q04_region_revenue",
      (s, dir) => tbl(s, dir, "orders")
        .join(broadcast(tbl(s, dir, "customer")), $"o_custkey" === $"c_custkey")
        .join(broadcast(tbl(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(tbl(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(dsum($"o_totalprice").as("revenue"), count(lit(1)).as("order_cnt"))
        .orderBy($"r_name"),
      Some("""SELECT r_name,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             |COUNT(*) AS order_cnt
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin),
    ),

    // Left-semi join (reference `pc.is_in` delta pattern,
    // examples/pyarrow_concepts.py:140-170).
    QueryDef(
      "q05_semi_join",
      (s, dir) => tbl(s, dir, "customer")
        .join(tbl(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_semi")
        .groupBy($"c_nationkey").agg(count(lit(1)).as("cust_cnt"))
        .orderBy($"c_nationkey"),
      Some("""SELECT c_nationkey, COUNT(*) AS cust_cnt FROM customer
             |WHERE c_custkey IN (SELECT o_custkey FROM orders)
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
    ),

    // Anti join with a filtered build side: customers with no large order.
    QueryDef(
      "q06_anti_join",
      (s, dir) => tbl(s, dir, "customer")
        .join(tbl(s, dir, "orders").where($"o_totalprice" > 300000),
          $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_nationkey").agg(count(lit(1)).as("cust_cnt"))
        .orderBy($"c_nationkey"),
      Some("""SELECT c_nationkey, COUNT(*) AS cust_cnt FROM customer
             |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
    ),

    // Full outer join of two keyed aggregates + fillna(0) — the
    // `join_counts` pattern (reference tests/test_util.py:78-81).
    QueryDef(
      "q07_full_outer",
      (s, dir) => {
        val cust = tbl(s, dir, "customer").groupBy($"c_nationkey".as("nationkey"))
          .agg(count(lit(1)).as("cust_cnt"))
        val supp = tbl(s, dir, "supplier").groupBy($"s_nationkey".as("nationkey"))
          .agg(count(lit(1)).as("supp_cnt"))
        cust.join(supp, Seq("nationkey"), "full_outer")
          .na.fill(0, Seq("cust_cnt", "supp_cnt"))
          .orderBy($"nationkey")
      },
      Some("""SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
             |COALESCE(c.cust_cnt, 0) AS cust_cnt, COALESCE(s.supp_cnt, 0) AS supp_cnt
             |FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS cust_cnt FROM customer GROUP BY 1) c
             |FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS supp_cnt FROM supplier GROUP BY 1) s
             |USING (nationkey) ORDER BY nationkey""".stripMargin),
    ),

    // W4 last-by-key via max_by hash aggregate (no window sort): the
    // stream->table upsert. ts is ns-precision read as long.
    QueryDef(
      "q08_last_by_key",
      (s, dir) => TableOps.lastByKeys(
          tbl(s, dir, "events"), Seq("user_id"), Seq("ts", "event_id"))
        .select($"user_id", $"event_id".as("last_event_id"), $"event_type", $"value")
        .orderBy($"user_id"),
      Some("""SELECT user_id, event_id AS last_event_id, event_type, value FROM (
             |SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin),
    ),

    // Multi-key variant (reference last_by_keys(["etf","ticker"]) shape).
    QueryDef(
      "q09_last_by_key2",
      (s, dir) => TableOps.lastByKeys(
          tbl(s, dir, "events"), Seq("user_id", "event_type"), Seq("ts", "event_id"))
        .select($"user_id", $"event_type", $"value".as("last_value"))
        .orderBy($"user_id", $"event_type"),
      Some("""SELECT user_id, event_type, value AS last_value FROM (
             |SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
             |FROM events) WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin),
    ),

    // Distinct (reference pc.unique / set nodes).
    QueryDef(
      "q10_distinct",
      (s, dir) => tbl(s, dir, "events").select($"event_type").distinct()
        .orderBy($"event_type"),
      Some("SELECT DISTINCT event_type FROM events ORDER BY event_type"),
    ),

    // Top-k = orderBy + limit; Spark plans TakeOrderedAndProject — no full
    // sort, per-partition heaps then merge. Unique tiebreaker for determinism.
    QueryDef(
      "q11_topk",
      (s, dir) => tbl(s, dir, "orders")
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey").limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),
    ),

    // Union of two typed streams (W6 concat) then aggregate.
    QueryDef(
      "q12_union_agg",
      (s, dir) => TableOps.concatStreams(
          tbl(s, dir, "customer").select($"c_nationkey".as("nationkey"), $"c_acctbal".as("acctbal")),
          tbl(s, dir, "supplier").select($"s_nationkey".as("nationkey"), $"s_acctbal".as("acctbal")))
        .groupBy($"nationkey")
        .agg(count(lit(1)).as("cnt"), dsum($"acctbal").as("total_bal"))
        .orderBy($"nationkey"),
      Some("""SELECT nationkey, COUNT(*) AS cnt,
             |CAST(SUM(CAST(acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
             |FROM (SELECT c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
             |UNION ALL SELECT s_nationkey, s_acctbal FROM supplier)
             |GROUP BY nationkey ORDER BY nationkey""".stripMargin),
    ),

    // Weighted average — the NAV formula (reference examples/etfs.py:70-91):
    // sum(price*qty)/sum(qty), exact decimal then one double division.
    QueryDef(
      "q13_weighted_avg",
      (s, dir) => tbl(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg((sum(dec($"l_extendedprice") * dec($"l_quantity")).cast("double") /
              sum(dec($"l_quantity")).cast("double")).as("nav"))
        .orderBy($"l_returnflag"),
      Some("""SELECT l_returnflag,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             | / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS nav
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    ),

    // Tumbling 1h window over the ns event stream (replay `frequency`
    // bucketing analog, reference replay.py:254-256). Bucket emitted as
    // epoch seconds BIGINT so both engines agree on type.
    QueryDef(
      "q14_hourly_window",
      (s, dir) => tbl(s, dir, "events")
        .groupBy((floor($"ts" / NsPerHour) * 3600L).cast("long").as("bucket_start"))
        .agg(count(lit(1)).as("event_cnt"), dsum($"value").as("sum_value"))
        .orderBy($"bucket_start"),
      Some("""SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS bucket_start,
             |COUNT(*) AS event_cnt,
             |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1 ORDER BY bucket_start""".stripMargin),
    ),

    // Running (cumulative) sum per key — the Accumulator/GetMax pattern
    // (reference examples/dag_concepts.py:91-107). Window summation order is
    // identical in both engines, so doubles match bit-for-bit.
    QueryDef(
      "q15_cumulative",
      (s, dir) => {
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        tbl(s, dir, "events")
          .select($"event_id", $"user_id",
            round(sum($"value").over(w), 2).as("running_value"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, user_id,
             |ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
             |FROM events ORDER BY event_id""".stripMargin),
    ),

    // String predicates (reference perspective comparators incl.
    // begins/contains/ends, perspective_wrapper.py:22-36).
    QueryDef(
      "q16_string_filter",
      (s, dir) => tbl(s, dir, "documents")
        .select($"doc_id", length($"text").cast("long").as("len"),
          $"text".startsWith("the").as("starts_the"),
          $"text".contains("vector").as("has_vector"),
          $"text".endsWith("dup").as("ends_dup"))
        .where($"has_vector" || $"starts_the")
        .orderBy($"doc_id"),
      Some("""SELECT doc_id, LENGTH(text) AS len,
             |(text LIKE 'the%') AS starts_the,
             |(text LIKE '%vector%') AS has_vector,
             |(text LIKE '%dup') AS ends_dup
             |FROM documents WHERE (text LIKE '%vector%') OR (text LIKE 'the%')
             |ORDER BY doc_id""".stripMargin),
    ),

    // Date/time parts + bucketing (reference kafka.py start-of-day math,
    // date_trunc analog).
    QueryDef(
      "q17_date_parts",
      (s, dir) => tbl(s, dir, "orders")
        .groupBy(year($"o_orderdate").as("o_year"), month($"o_orderdate").as("o_month"))
        .agg(count(lit(1)).as("order_cnt"), dsum($"o_totalprice").as("total"))
        .orderBy($"o_year", $"o_month"),
      Some("""SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
             |CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS o_month,
             |COUNT(*) AS order_cnt,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY 1, 2 ORDER BY o_year, o_month""".stripMargin),
    ),

    // JSON wire-format extraction (reference pyarrow_kafka.py:16-34):
    // from_json with explicit schema — no inference, matching the reference.
    QueryDef(
      "q18_json_extract",
      (s, dir) => tbl(s, dir, "events")
        .select($"event_type",
          from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k"))
        .groupBy($"event_type")
        .agg(sum($"k").cast("long").as("sum_k"), count(lit(1)).as("cnt"))
        .orderBy($"event_type"),
      Some("""SELECT event_type,
             |CAST(SUM(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER)) AS BIGINT) AS sum_k,
             |COUNT(*) AS cnt
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),

    // Conditional aggregation.
    QueryDef(
      "q19_conditional_agg",
      (s, dir) => tbl(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(
          sum(when($"o_totalprice" > 200000, 1).otherwise(0)).cast("long").as("high_cnt"),
          sum(when($"o_orderstatus" === "F", 1).otherwise(0)).cast("long").as("f_cnt"),
          count(lit(1)).as("cnt"))
        .orderBy($"o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS high_cnt,
             |CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
             |COUNT(*) AS cnt
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    ),

    // IN-list filter (reference pc.is_in semi-join pattern).
    QueryDef(
      "q20_isin",
      (s, dir) => tbl(s, dir, "events")
        .where($"event_type".isin("click", "purchase"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("cnt"), dsum($"value").as("sum_value"))
        .orderBy($"event_type"),
      Some("""SELECT event_type, COUNT(*) AS cnt,
             |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events WHERE event_type IN ('click', 'purchase')
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),

    // Group + HAVING.
    QueryDef(
      "q21_having",
      (s, dir) => tbl(s, dir, "part")
        .groupBy($"p_brand").agg(count(lit(1)).as("cnt"))
        .where($"cnt" > 30)
        .orderBy($"p_brand"),
      Some("""SELECT p_brand, COUNT(*) AS cnt FROM part GROUP BY p_brand
             |HAVING COUNT(*) > 30 ORDER BY p_brand""".stripMargin),
    ),

    // Word count — the reference's flagship streaming example
    // (examples/kafka_concepts.py:12-31) as a batch explode+agg.
    QueryDef(
      "q22_wordcount",
      (s, dir) => tbl(s, dir, "documents")
        .select(explode(split($"text", " ")).as("word"))
        .groupBy($"word").agg(count(lit(1)).as("cnt"))
        .orderBy($"word"),
      Some("""SELECT word, COUNT(*) AS cnt FROM (
             |SELECT unnest(string_split(text, ' ')) AS word FROM documents)
             |GROUP BY word ORDER BY word""".stripMargin),
    ),

    // The flagship ETF-NAV dataflow (reference examples/pyarrow_concepts.py:53-117)
    // mapped onto the star schema: composition=lineitem(etf=orderkey,
    // ticker=partkey, qty), price=part.retailprice. Broadcast the price dim;
    // the big composition side never shuffles before the per-etf aggregate.
    QueryDef(
      "q23_etf_nav",
      (s, dir) => tbl(s, dir, "lineitem")
        .join(broadcast(tbl(s, dir, "part")), $"l_partkey" === $"p_partkey")
        .groupBy($"l_orderkey".as("etf"))
        .agg(
          sum(dec($"p_retailprice") * dec($"l_quantity")).cast("double").as("value"),
          (sum(dec($"p_retailprice") * dec($"l_quantity")).cast("double") /
            sum(dec($"l_quantity")).cast("double")).as("nav"))
        .orderBy($"etf"),
      Some("""SELECT l_orderkey AS etf,
             |CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS value,
             |CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             | / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS nav
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY l_orderkey ORDER BY etf""".stripMargin),
    ),
    // Ranking/analytic window functions over a partitioned order.
    QueryDef(
      "q37_rank_lag",
      (s, dir) => {
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        tbl(s, dir, "events")
          .select($"event_id", $"user_id",
            rank().over(w).cast("long").as("rk"),
            lag($"value", 1).over(w).as("prev_value"),
            lead($"event_type", 1).over(w).as("next_type"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, user_id,
             |RANK() OVER w AS rk,
             |LAG(value, 1) OVER w AS prev_value,
             |LEAD(event_type, 1) OVER w AS next_type
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY event_id""".stripMargin),
    ),

    // AS-OF join: each purchase picks the prevailing (latest at-or-before)
    // view value per user — union + one keyed sort + last-ignoreNulls, the
    // sort-merge-cost formulation. Oracle = DuckDB's NATIVE ASOF JOIN.
    QueryDef(
      "q53_asof_join",
      (s, dir) => {
        val ev = tbl(s, dir, "events")
        val trades = ev.where($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts", $"value")
        val quotes = ev.where($"event_type" === "view")
        graft.operators.AsofJoin
          .asofJoin(trades, quotes, "user_id", "ts", "value", "event_id")
          // epoch MICROS out: DuckDB reads the ns parquet as a us TIMESTAMP
          .select($"event_id", $"user_id", expr("ts div 1000").as("ts_us"),
            $"value", expr("asof_ts div 1000").as("asof_ts_us"), $"asof_value")
          .orderBy($"event_id")
      },
      Some("""WITH quotes AS (
             |  SELECT user_id, ts, max_by(value, event_id) AS r_val
             |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
             |trades AS (
             |  SELECT event_id, user_id, ts, value
             |  FROM events WHERE event_type = 'purchase')
             |SELECT t.event_id, t.user_id, epoch_us(t.ts) AS ts_us, t.value,
             |  epoch_us(q.ts) AS asof_ts_us, q.r_val AS asof_value
             |FROM trades t ASOF LEFT JOIN quotes q
             |  ON t.user_id = q.user_id AND t.ts >= q.ts
             |ORDER BY t.event_id""".stripMargin),
    ),

    // NEAREST as-of with tolerance (pandas merge_asof
    // direction='nearest'): each purchase takes the user's view CLOSEST
    // in time — past or future, past winning exact ties — and matches
    // farther than 10 minutes drop to NULL. One exchange, two sorted
    // window carries, a branchless pick; the oracle composes DuckDB's
    // two directional ASOF joins with the same tie/tolerance rule.
    QueryDef(
      "q363_asof_nearest",
      (s, dir) => {
        val ev = tbl(s, dir, "events")
        val trades = ev.where($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts", $"value")
        val quotes = ev.where($"event_type" === "view")
        graft.operators.AsofJoin
          .asofJoinNearest(trades, quotes, "user_id", "ts", "value",
            "event_id", toleranceNs = 600000000000L)
          .select($"event_id", $"user_id", expr("ts div 1000").as("ts_us"),
            $"value", expr("asof_ts div 1000").as("asof_ts_us"), $"asof_value")
          .orderBy($"event_id")
      },
      Some("""WITH quotes AS (
             |  SELECT user_id, ts, max_by(value, event_id) AS r_val
             |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
             |trades AS (
             |  SELECT event_id, user_id, ts, value
             |  FROM events WHERE event_type = 'purchase'),
             |bk AS (
             |  SELECT t.event_id, q.ts AS b_ts, q.r_val AS b_val
             |  FROM trades t ASOF LEFT JOIN quotes q
             |    ON t.user_id = q.user_id AND t.ts >= q.ts),
             |fw AS (
             |  SELECT t.event_id, q.ts AS f_ts, q.r_val AS f_val
             |  FROM trades t ASOF LEFT JOIN quotes q
             |    ON t.user_id = q.user_id AND t.ts <= q.ts),
             |j AS (
             |  SELECT t.event_id, t.user_id, epoch_ns(t.ts) AS ts_ns, t.value,
             |    epoch_ns(b_ts) AS b_ns, b_val, epoch_ns(f_ts) AS f_ns, f_val
             |  FROM trades t JOIN bk USING (event_id) JOIN fw USING (event_id)),
             |p AS (
             |  SELECT event_id, user_id, ts_ns, value,
             |    CASE
             |      WHEN b_ns IS NOT NULL AND ts_ns - b_ns <= 600000000000
             |        AND (f_ns IS NULL OR f_ns - ts_ns > 600000000000
             |             OR ts_ns - b_ns <= f_ns - ts_ns) THEN b_ns
             |      WHEN f_ns IS NOT NULL AND f_ns - ts_ns <= 600000000000 THEN f_ns
             |    END AS a_ns,
             |    CASE
             |      WHEN b_ns IS NOT NULL AND ts_ns - b_ns <= 600000000000
             |        AND (f_ns IS NULL OR f_ns - ts_ns > 600000000000
             |             OR ts_ns - b_ns <= f_ns - ts_ns) THEN b_val
             |      WHEN f_ns IS NOT NULL AND f_ns - ts_ns <= 600000000000 THEN f_val
             |    END AS a_val
             |  FROM j)
             |SELECT event_id, user_id, ts_ns // 1000 AS ts_us, value,
             |  a_ns // 1000 AS asof_ts_us, a_val AS asof_value
             |FROM p ORDER BY event_id""".stripMargin),
    ),

    // Bucketed range join: views landing in each purchase's trailing hour,
    // per user — equi-join on (key, time bucket) + residual BETWEEN, not a
    // nested loop. Oracle = DuckDB's plain range join.
    QueryDef(
      "q54_range_join",
      (s, dir) => {
        val hourNs = 3600L * 1000000000L
        val ev = tbl(s, dir, "events")
        val views = ev.where($"event_type" === "view")
          .select($"user_id", $"ts", $"event_id".as("view_id"))
        // trailing 24h window, 6h buckets: each window explodes into <= 5
        // buckets (amplification = len/width + 1 — the knob the operator doc
        // describes)
        val windows = ev.where($"event_type" === "purchase")
          .select($"event_id".as("purchase_id"), $"user_id",
            ($"ts" - 24L * hourNs).as("lo"), $"ts".as("hi"))
        graft.operators.RangeJoin
          .rangeJoin(views, windows, "user_id", "ts", "lo", "hi", 6L * hourNs)
          .groupBy($"purchase_id")
          .agg(count(lit(1)).as("views_24h"),
            min($"view_id").as("first_view"), max($"view_id").as("last_view"))
          .orderBy($"purchase_id")
      },
      Some("""WITH v AS (SELECT user_id, ts, event_id AS view_id FROM events
             |           WHERE event_type = 'view'),
             |p AS (SELECT event_id AS purchase_id, user_id, ts FROM events
             |      WHERE event_type = 'purchase')
             |SELECT p.purchase_id, COUNT(*) AS views_24h,
             |  MIN(v.view_id) AS first_view, MAX(v.view_id) AS last_view
             |FROM p JOIN v ON v.user_id = p.user_id
             |  AND v.ts BETWEEN p.ts - INTERVAL 24 HOUR AND p.ts
             |GROUP BY 1 ORDER BY 1""".stripMargin),
    ),

    // Batch sessionization (gaps-and-islands): session = maximal run of
    // per-user events with < 30 min between neighbors. One keyed sort +
    // two windows — the batch twin of Streaming.sessionCounts.
    QueryDef(
      "q57_sessionize",
      (s, dir) => {
        val gapNs = 30L * 60L * 1000000000L
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        tbl(s, dir, "events")
          .withColumn("new_session",
            when(($"ts" - lag($"ts", 1).over(w)) > gapNs || lag($"ts", 1).over(w).isNull, 1)
              .otherwise(0))
          .withColumn("session_id",
            sum($"new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy($"user_id", $"session_id")
          .agg(count(lit(1)).as("n_events"),
            expr("min(ts) div 1000").as("first_us"),
            expr("max(ts) div 1000").as("last_us"))
          .orderBy($"user_id", $"session_id")
      },
      Some("""WITH marked AS (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
             |         THEN 1 ELSE 0 END AS new_session
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, ts,
             |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM marked)
             |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             |  COUNT(*) AS n_events,
             |  MIN(epoch_us(ts)) AS first_us, MAX(epoch_us(ts)) AS last_us
             |FROM sess GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin),
    ),

    // Rollup audit aggregation (source x lang hierarchies) — the data-audit
    // shape a training pipeline runs over corpus partitions.
    QueryDef(
      "q38_rollup",
      (s, dir) => tbl(s, dir, "documents")
        .rollup($"source", $"lang")
        .agg(count(lit(1)).as("doc_cnt"), sum($"n_chars").cast("long").as("chars"))
        .orderBy($"source".asc_nulls_first, $"lang".asc_nulls_first),
      Some("""SELECT source, lang, COUNT(*) AS doc_cnt, CAST(SUM(n_chars) AS BIGINT) AS chars
             |FROM documents GROUP BY ROLLUP (source, lang)
             |ORDER BY source ASC NULLS FIRST, lang ASC NULLS FIRST""".stripMargin),
    ),

    // Conversion funnel: per user, purchases preceded by a view within 1h —
    // built on the AS-OF operator (one sort-merge-shaped pass), NOT a range
    // self-join, so the probe side streams through once at any scale.
    QueryDef(
      "q66_funnel",
      (s, dir) => {
        val ev = tbl(s, dir, "events")
        val views = ev.where($"event_type" === "view")
          .select($"event_id", $"user_id", $"ts")
        val purchases = ev.where($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts")
        graft.operators.AsofJoin
          .asofJoin(purchases, views, "user_id", "ts", "event_id", "event_id")
          .withColumn("converted",
            $"asof_ts".isNotNull && ($"ts" - $"asof_ts") <= NsPerHour)
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_purchases"),
            sum(when($"converted", 1L).otherwise(0L)).as("n_converted"),
            min(when($"converted", $"event_id")).as("first_conv_purchase"))
          .orderBy($"user_id")
      },
      Some("""WITH v AS (
             |  SELECT user_id, ts, max_by(event_id, event_id) AS v_id
             |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
             |p AS (SELECT event_id, user_id, ts FROM events
             |      WHERE event_type = 'purchase'),
             |m AS (
             |  SELECT p.user_id, p.event_id,
             |    v.ts IS NOT NULL
             |      AND epoch_ns(p.ts) - epoch_ns(v.ts) <= 3600000000000 AS conv
             |  FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts)
             |SELECT user_id, COUNT(*) AS n_purchases,
             |  CAST(SUM(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
             |  MIN(CASE WHEN conv THEN event_id END) AS first_conv_purchase
             |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin),
    ),

    // Cohort retention: users bucketed by first-activity day, activity
    // counted per week offset. Two shuffles (user-keyed min, then the tiny
    // cohort-week rollup); the user->cohort join shuffles by user_id like
    // any fact-to-derived-dim join and AQE handles skewed users.
    QueryDef(
      "q67_cohorts",
      (s, dir) => {
        val dayNs = 86400L * 1000000000L
        val ev = tbl(s, dir, "events")
          .select($"user_id", expr(s"ts div $dayNs").as("day"))
        val cohorts = ev.groupBy($"user_id").agg(min($"day").as("cohort_day"))
        ev.join(cohorts, Seq("user_id"))
          .select($"cohort_day", expr("(day - cohort_day) div 7").as("week_offset"),
            $"user_id")
          .groupBy($"cohort_day", $"week_offset")
          .agg(countDistinct($"user_id").as("active_users"))
          .orderBy($"cohort_day", $"week_offset")
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
             |c AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id)
             |SELECT c.cohort_day, (e.day - c.cohort_day) // 7 AS week_offset,
             |  COUNT(DISTINCT e.user_id) AS active_users
             |FROM e JOIN c USING (user_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    ),

    // RFM segmentation: per-user recency/frequency/monetary over purchase
    // events, quintile-scored with ntile (deterministic: the ntile input
    // ordering carries user_id as a unique tiebreaker). One user-keyed
    // aggregate, then three windows over the per-user ROLLUP (not the fact
    // table). SCALE NOTE: an unpartitioned ntile is a single-reducer sort
    // of the rollup — exact and fine up to ~10^8 users; past that swap the
    // scoring to approx_percentile cut points (computed map-side
    // combinable, then a map-only bucket lookup) and accept boundary-tie
    // divergence from exact quintiles. The ntile form is the exact
    // reference semantics the oracle can replicate.
    QueryDef(
      "q73_rfm",
      (s, dir) => {
        val p = tbl(s, dir, "events").where($"event_type" === "purchase")
        val rollup = p.groupBy($"user_id")
          .agg(max($"ts").as("last_ts"), count(lit(1)).as("frequency"),
            dsum($"value").as("monetary"))
        def score(c: String, asc: Boolean) = ntile(5).over(
          Window.orderBy(if (asc) col(c).asc else col(c).desc, $"user_id"))
        rollup
          .withColumn("r_score", score("last_ts", asc = false).cast("long"))
          .withColumn("f_score", score("frequency", asc = false).cast("long"))
          .withColumn("m_score", score("monetary", asc = false).cast("long"))
          .select($"user_id", expr("last_ts div 1000").as("last_us"),
            $"frequency", $"monetary", $"r_score", $"f_score", $"m_score")
          .orderBy($"user_id")
      },
      Some("""WITH r AS (
             |  SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS frequency,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
             |  FROM events WHERE event_type = 'purchase' GROUP BY user_id)
             |SELECT user_id, epoch_us(last_ts) AS last_us, frequency, monetary,
             |  CAST(ntile(5) OVER (ORDER BY last_ts DESC, user_id) AS BIGINT) AS r_score,
             |  CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS BIGINT) AS f_score,
             |  CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id) AS BIGINT) AS m_score
             |FROM r ORDER BY user_id""".stripMargin),
    ),

    // Stream × dimension enrichment: the events fact joined through the
    // TPC-H customer/nation dims (both broadcast — the fact never shuffles
    // before the final per-nation rollup). The mixed-domain shape every
    // activity dashboard needs: behavioral stream, relational dimensions.
    QueryDef(
      "q89_user_nation_activity",
      (s, dir) => tbl(s, dir, "events")
        .join(broadcast(tbl(s, dir, "customer")), $"user_id" === $"c_custkey")
        .join(broadcast(tbl(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(count(lit(1)).as("events"),
          countDistinct($"user_id").as("users"),
          sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("purchases"),
          dsum($"value").as("sum_value"))
        .orderBy($"n_name"),
      Some("""SELECT n_name, COUNT(*) AS events,
             |  COUNT(DISTINCT user_id) AS users,
             |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events JOIN customer ON user_id = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin),
    ),

    // TPC-H Q8-flavored MARKET SHARE: per (region, order month), every
    // nation's share of its region's order revenue, in exact integer ppm
    // over cents (cents quantize via round-then-cast on both sides — the
    // q225 rule). The classic multi-join star (orders → customer →
    // nation → region) with a region-month window over the ROLLUP only;
    // all three dimension tables broadcast (they are catalog-sized at
    // any scale factor — the plan never shuffles the fact for the
    // joins, only for the (region, month, nation) partial agg).
    QueryDef(
      "q269_market_share",
      (s, dir) => {
        val rev = tbl(s, dir, "orders")
          .join(broadcast(tbl(s, dir, "customer")), $"o_custkey" === $"c_custkey")
          .join(broadcast(tbl(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(tbl(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name", month($"o_orderdate").cast("long").as("o_month"),
            $"n_name")
          .agg(sum(round($"o_totalprice" * 100).cast("long")).as("rev_c"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"r_name", $"o_month")
        rev.withColumn("region_rev_c", sum($"rev_c").over(w))
          .select($"r_name", $"o_month", $"n_name", $"rev_c",
            expr("(rev_c * 1000000) div region_rev_c").as("share_ppm"))
          .orderBy($"r_name", $"o_month", $"n_name")
      },
      Some("""WITH rev AS (
             |  SELECT r_name, CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS o_month,
             |    n_name,
             |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
             |  FROM orders
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey
             |  GROUP BY 1, 2, 3)
             |SELECT r_name, o_month, n_name, rev_c,
             |  (rev_c * 1000000)
             |    // CAST(SUM(rev_c) OVER (PARTITION BY r_name, o_month) AS BIGINT)
             |    AS share_ppm
             |FROM rev ORDER BY r_name, o_month, n_name""".stripMargin),
    ),
  )

  // Sugar: $"..." without importing spark.implicits per closure.
  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
