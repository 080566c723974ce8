package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One catalog entry: a Spark query over the harness tables plus (usually)
  * an equivalent DuckDB SQL oracle. Names and output column names MUST match
  * between the two — the driver sorts columns by name before hashing.
  *
  * `benchRun`, when set, is the configuration the BENCHMARK times instead
  * of `run` — used where the oracle-checked `run` deliberately carries
  * portable-md5 plumbing (or a bounded corpus) that exists only so DuckDB
  * can replay the values. The benched number should always be the
  * production (xxhash64, full-volume) configuration; Verify keeps using
  * `run`.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    benchRun: Option[(SparkSession, String) => DataFrame] = None)

/** The operator catalog. Each query exercises one operator family from
  * SURVEY.md §2, re-expressed over the TPC-H-ish harness tables
  * (TESTDATA.md). Reference sites are cited per query.
  *
  * Determinism rules (driver hash-compares against DuckDB):
  *   - every query ends in a total-order `orderBy`;
  *   - every derived double is `round(_, 2)` (or 3/4 where noted) on BOTH
  *     sides — sum-of-double is order-dependent across engines;
  *   - collected arrays are sorted and joined to strings (array hashing
  *     across engines is fragile, string hashing is not).
  */
object Queries {
  import Tables._

  private def r2(c: Column): Column = round(c, 2)

  /** All registered queries, in catalog order. */
  def all: Seq[Q] =
    relational ++ UmlsQueries.umls ++ text ++ similarity ++
      MultimodalQueries.multimodal ++ PipelineQueries.ops

  def byName: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** What the benchmark times: `benchRun` (the production configuration)
    * where present, `run` otherwise. */
  def benchByName: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.benchRun.getOrElse(q.run)).toMap

  /** Names whose benched configuration differs from the verified one —
    * recorded in the bench detail JSON for transparency. */
  def benchOverridden: Seq[String] =
    all.filter(_.benchRun.isDefined).map(_.name)

  def oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  // ==========================================================================
  // Relational core — scans, filters, projections, joins, aggregations,
  // sorts, set ops, window functions (SURVEY.md §2.1-§2.8).
  // ==========================================================================

  private[graft] def relational: Seq[Q] = Seq(
    // ----- A1/A7-style grouped aggregation (umls2rdf.py:600-605 analog):
    // the classic pricing-summary shape; map-side partial agg, one shuffle.
    Q("q01_agg_pricing",
      (s, d) =>
        lineitem(s, d)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            r2(sum("l_quantity")).as("sum_qty"),
            r2(sum("l_extendedprice")).as("sum_base_price"),
            r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
              .as("sum_disc_price"),
            r2(avg("l_quantity")).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 2) AS avg_qty,
               count(*) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ----- F1-F6 pushed-down conjunctive filter + projection
    // (umls2rdf.py:598-600). `.explain` must show PushedFilters on parquet.
    Q("q02_filter_pushdown",
      (s, d) =>
        lineitem(s, d)
          .filter(col("l_returnflag") === "R" && col("l_quantity") > 30)
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE l_returnflag = 'R' AND l_quantity > 30
        ORDER BY l_orderkey, l_linenumber""")),

    // ----- P1 DISTINCT projection (umls2rdf.py:157-158).
    Q("q03_distinct_proj",
      (s, d) =>
        lineitem(s, d)
          .select("l_returnflag", "l_linestatus")
          .distinct()
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""
        SELECT DISTINCT l_returnflag, l_linestatus
        FROM lineitem
        ORDER BY l_returnflag, l_linestatus""")),

    // ----- O5/O7 top-k: global sort + limit (umls2rdf.py:118-122 analog).
    // Spark plans this as TakeOrderedAndProject — no full sort at scale.
    Q("q04_topk",
      (s, d) =>
        orders(s, d)
          .select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10),
      Some("""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10""")),

    // ----- J1-style equi-join + aggregation (umls2rdf.py:663-666).
    // customer (small) is broadcast; no shuffle of orders.
    Q("q05_join_agg",
      (s, d) =>
        orders(s, d)
          .join(broadcast(customer(s, d)),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            r2(sum("o_totalprice")).as("total"))
          .orderBy("c_mktsegment"),
      Some("""
        SELECT c_mktsegment, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")),

    // ----- J2 3-way join (umls2rdf.py:201-213 analog): revenue per nation.
    // nation+customer broadcast; lineitem⋈orders is the only big shuffle.
    Q("q06_join_3way",
      (s, d) =>
        lineitem(s, d)
          .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue"))
          .orderBy("n_name"),
      Some("""
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name""")),

    // ----- J9 semi-join (cui_roots membership, umls2rdf.py:695-697):
    // customers that placed at least one high-value order.
    Q("q07_semi_join",
      (s, d) =>
        customer(s, d)
          .join(orders(s, d).filter(col("o_totalprice") > 100000)
            .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey"),
      Some("""
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        ORDER BY c_custkey""")),

    // ----- anti-join (the dual of J9; J3's "unresolved rels dropped",
    // umls2rdf.py:717): customers with no open order.
    Q("q08_anti_join",
      (s, d) =>
        customer(s, d)
          .join(orders(s, d).filter(col("o_orderstatus") === "O")
            .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey"),
      Some("""
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        ORDER BY c_custkey""")),

    // ----- A7 rank-argmax (umls2rdf.py:320-326): highest-priced order per
    // customer, deterministic tie-break — exactly the MRRANK prefLabel pick.
    Q("q09_argmax_window",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey").as("best_order"),
            col("o_totalprice").as("max_price"))
          .orderBy("o_custkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey AS best_order, o_totalprice AS max_price
        FROM (SELECT *, row_number() OVER
                (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders)
        WHERE rn = 1
        ORDER BY o_custkey""")),

    // ----- A1 group-and-collect (the core "one class per code" groupBy,
    // umls2rdf.py:545,600-605): line numbers per order as a sorted list.
    Q("q10_group_collect",
      (s, d) =>
        lineitem(s, d)
          .groupBy("l_orderkey")
          .agg(
            array_join(
              array_sort(collect_list(col("l_linenumber").cast("string"))),
              ",").as("lines"),
            count(lit(1)).as("n_lines"))
          .orderBy("l_orderkey"),
      Some("""
        SELECT l_orderkey,
               array_to_string(list_sort(list(l_linenumber::VARCHAR)), ',') AS lines,
               count(*) AS n_lines
        FROM lineitem
        GROUP BY l_orderkey
        ORDER BY l_orderkey""")),

    // ----- A14 pivot (MRDOC property_docs pivot, umls2rdf.py:854-864):
    // order value by priority × status.
    Q("q11_pivot",
      (s, d) =>
        orders(s, d)
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("O", "F", "P"))
          .agg(r2(sum("o_totalprice")))
          .orderBy("o_orderpriority"),
      Some("""
        SELECT o_orderpriority,
               round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS "O",
               round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS "F",
               round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS "P"
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // ----- O2-style window: running revenue per customer over order dates
    // (deterministic window order incl. key tie-break).
    Q("q12_window_running",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            r2(sum("o_totalprice").over(w)).as("running_total"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                 AS running_total
        FROM orders
        ORDER BY o_custkey, o_orderkey""")),

    // ----- §2.7 set ops: UNION DISTINCT of two key sets.
    Q("q13_union",
      (s, d) =>
        customer(s, d).select(col("c_nationkey").as("nationkey"))
          .union(supplier(s, d).select(col("s_nationkey").as("nationkey")))
          .distinct()
          .orderBy("nationkey"),
      Some("""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
        ORDER BY nationkey""")),

    // ----- §2.7 set ops: EXCEPT (nations with customers but no suppliers).
    Q("q14_except",
      (s, d) =>
        customer(s, d).select(col("c_nationkey").as("nationkey"))
          .except(supplier(s, d).select(col("s_nationkey").as("nationkey")))
          .orderBy("nationkey"),
      Some("""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier
        ORDER BY nationkey""")),

    // ----- C9-style CASE WHEN classification + F12-style blacklist
    // (umls2rdf.py:438-445,514-520).
    Q("q15_case_blacklist",
      (s, d) =>
        orders(s, d)
          .filter(!col("o_orderpriority").isin("5-LOW"))
          .withColumn("bucket",
            when(col("o_totalprice") > 200000, "high")
              .when(col("o_totalprice") > 100000, "mid")
              .otherwise("low"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"))
          .orderBy("bucket"),
      Some("""
        SELECT CASE WHEN o_totalprice > 200000 THEN 'high'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'low' END AS bucket,
               count(*) AS n
        FROM orders
        WHERE o_orderpriority NOT IN ('5-LOW')
        GROUP BY 1
        ORDER BY bucket""")),

    // ----- C1/C8 string transforms (escape chain umls2rdf.py:103-104;
    // label prettify :522-527).
    Q("q16_string_funcs",
      (s, d) =>
        part(s, d)
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("uname"),
            regexp_replace(col("p_name"), " ", "_").as("slug"),
            length(col("p_name")).as("name_len"),
            concat(lit("part/"), col("p_partkey").cast("string"), lit("/"),
              regexp_replace(col("p_name"), " ", "%20")).as("uri"))
          .orderBy("p_partkey"),
      Some("""
        SELECT p_partkey, upper(p_name) AS uname,
               regexp_replace(p_name, ' ', '_', 'g') AS slug,
               length(p_name) AS name_len,
               'part/' || p_partkey || '/' || regexp_replace(p_name, ' ', '%20', 'g') AS uri
        FROM part
        ORDER BY p_partkey""")),

    // ----- C4 empty-string falsiness (get_rel_fragment umls2rdf.py:131-132):
    // length()>0 test, NOT isNotNull — MySQL '' vs NULL distinction.
    Q("q17_coalesce_falsy",
      (s, d) =>
        documents(s, d)
          .select(col("doc_id"),
            when(length(trim(col("lang"))) > 0, col("lang"))
              .otherwise("und").as("lang_norm"),
            when(length(col("source")) > 0, col("source"))
              .otherwise(lit("unknown")).as("source_norm"))
          .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               CASE WHEN length(trim(lang)) > 0 THEN lang ELSE 'und' END AS lang_norm,
               CASE WHEN length(source) > 0 THEN source ELSE 'unknown' END AS source_norm
        FROM documents
        ORDER BY doc_id""")),

    // ----- time-window batch aggregation (§2.10 / events table):
    // tumbling 1-hour windows via date_trunc.
    Q("q18_time_window",
      (s, d) =>
        events(s, d)
          .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), r2(sum("value")).as("total"))
          .orderBy("hour", "event_type"),
      Some("""
        SELECT date_trunc('hour', ts) AS hour, event_type,
               count(*) AS n, round(sum(value), 2) AS total
        FROM events
        GROUP BY 1, 2
        ORDER BY hour, event_type""")),

    // ----- sessionization in batch (lag + cumulative flag): 30-min gap
    // starts a new session. Gap test in exact integer MICROseconds on both
    // sides — a seconds cast floors in Spark but rounds in DuckDB's
    // epoch()::BIGINT, so sub-second boundaries would disagree.
    Q("q19_sessionize",
      (s, d) => {
        val byUser = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        events(s, d)
          .withColumn("ts_us", unix_micros(col("ts")))
          .withColumn("prev_ts", lag(col("ts_us"), 1).over(byUser))
          .withColumn("new_s",
            when(col("prev_ts").isNotNull &&
              col("ts_us") - col("prev_ts") > 1800000000L, 1)
              .otherwise(0))
          .groupBy("user_id")
          .agg((sum("new_s") + 1).as("n_sessions"),
            count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      Some("""
        WITH g AS (
          SELECT user_id,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                      THEN 1 ELSE 0 END AS new_s
          FROM events)
        SELECT user_id, (sum(new_s) + 1)::BIGINT AS n_sessions, count(*) AS n_events
        FROM g
        GROUP BY user_id
        ORDER BY user_id""")),

    // ----- count + count-distinct (S3 scan counts, umls2rdf.py:219-226).
    Q("q20_count_distinct",
      (s, d) =>
        events(s, d)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            countDistinct("user_id").as("n_users"))
          .orderBy("event_type"),
      Some("""
        SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // ----- A3-A6 sorted-distinct collected arrays (altLabels/defs/cuis/tuis,
    // umls2rdf.py:291-293,412-479): distinct parts per order, sorted.
    Q("q21_array_distinct_sorted",
      (s, d) =>
        lineitem(s, d)
          .groupBy("l_orderkey")
          .agg(
            array_join(
              array_sort(array_distinct(
                collect_list(col("l_partkey").cast("string")))), ",")
              .as("parts"),
            countDistinct("l_partkey").as("n_parts"))
          .orderBy("l_orderkey"),
      Some("""
        SELECT l_orderkey,
               array_to_string(list_sort(list(DISTINCT l_partkey::VARCHAR)), ',') AS parts,
               count(DISTINCT l_partkey) AS n_parts
        FROM lineitem
        GROUP BY l_orderkey
        ORDER BY l_orderkey""")),

    // ----- O2 custom comparator sort inside a group (CHD-first rel sort,
    // umls2rdf.py:365-374): 'R'-flag lines first, then by status/partkey.
    // Spark: sort-key struct + array_sort; DuckDB: string_agg ORDER BY.
    Q("q22_sortkey_struct",
      (s, d) =>
        lineitem(s, d)
          .groupBy("l_orderkey")
          .agg(
            array_join(
              transform(
                array_sort(collect_list(struct(
                  (col("l_returnflag") =!= "R").cast("int").as("k1"),
                  col("l_linestatus").as("k2"),
                  col("l_partkey").as("k3"),
                  col("l_linenumber").as("display")))),
                x => x.getField("display").cast("string")),
              ";").as("ordered_lines"))
          .orderBy("l_orderkey"),
      Some("""
        SELECT l_orderkey,
               string_agg(l_linenumber::VARCHAR, ';'
                 ORDER BY (l_returnflag != 'R')::INT, l_linestatus,
                          l_partkey, l_linenumber) AS ordered_lines
        FROM lineitem
        GROUP BY l_orderkey
        ORDER BY l_orderkey""")),

    // ----- J13-style self-join (STY parent derivation, umls2rdf.py:170-182):
    // pair each nation with sibling nations in the same region.
    Q("q23_self_join",
      (s, d) => {
        val n1 = nation(s, d).select(col("n_nationkey").as("a_key"),
          col("n_name").as("a_name"), col("n_regionkey").as("a_region"))
        val n2 = nation(s, d).select(col("n_nationkey").as("b_key"),
          col("n_name").as("b_name"), col("n_regionkey").as("b_region"))
        n1.join(n2, col("a_region") === col("b_region") &&
            col("a_key") < col("b_key"))
          .select("a_name", "b_name")
          .orderBy("a_name", "b_name")
      },
      Some("""
        SELECT a.n_name AS a_name, b.n_name AS b_name
        FROM nation a JOIN nation b
          ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
        ORDER BY a_name, b_name""")),

    // ----- left outer join + null handling (tree parents J12 may be absent).
    Q("q24_left_join",
      (s, d) =>
        customer(s, d)
          .join(orders(s, d).groupBy("o_custkey")
            .agg(count(lit(1)).as("cnt")),
            col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"),
            coalesce(col("cnt"), lit(0L)).as("n_orders"))
          .orderBy("c_custkey"),
      Some("""
        SELECT c_custkey, coalesce(cnt, 0) AS n_orders
        FROM customer LEFT JOIN
          (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1) o
          ON c_custkey = o_custkey
        ORDER BY c_custkey""")),

    // ----- skew-mitigated join by key salting (SkewJoin.saltedInnerJoin):
    // lineitem concentrates on a handful of suppliers — the salted join
    // spreads each hot supplier key over `salts` reducers. The oracle is
    // the PLAIN join: salting must not change results.
    Q("q23b_salted_join",
      (s, d) => {
        val li = lineitem(s, d)
          .withColumnRenamed("l_suppkey", "s_suppkey")
        graft.operators.SkewJoin.saltedInnerJoin(
          li, supplier(s, d), key = "s_suppkey", salts = 8,
          saltSource = col("l_orderkey") * lit(16) + col("l_linenumber"))
          .groupBy("s_name")
          .agg(count(lit(1)).as("n_lines"),
            r2(sum("l_extendedprice")).as("revenue"))
          .orderBy("s_name")
      },
      Some("""
        SELECT s_name, count(*) AS n_lines,
               round(sum(l_extendedprice), 2) AS revenue
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_name
        ORDER BY s_name""")),

    // ----- Bloom-pruned semi-join (SkewJoin.bloomSemiJoin): lineitem
    // against the urgent orders — the dim fits an 8 MB sketch, not a
    // broadcast hash table, so the sketch prunes the fact map-side and
    // the exact verify join sees only survivors. Bloom has no false
    // negatives and the verify removes false positives, so the oracle is
    // the PLAIN semi-join: the sketch must not change results.
    Q("q91_bloom_semijoin",
      (s, d) => {
        val urgent = orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
        graft.operators.SkewJoin.bloomSemiJoin(
          lineitem(s, d), urgent, "l_orderkey", "o_orderkey")
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                             WHERE o_orderpriority = '1-URGENT')
        ORDER BY l_orderkey, l_linenumber""")),

    // ----- as-of join (TemporalJoin.asofJoin): every click enriched with
    // the user's latest at-or-before error — the union-and-window form
    // (one keyed shuffle, NO join node; naive SQL would be a nested-loop
    // inequality join). Oracle: DuckDB's native ASOF LEFT JOIN — an
    // independent implementation of the same semantics. The right side is
    // pre-aggregated to one row per (user, ts) so "latest" is well-defined
    // in both engines.
    Q("q64_asof_join",
      (s, d) => {
        val ev = events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts")
        val errs = ev.filter(col("event_type") === "error")
          .groupBy("user_id", "ts").agg(max("value").as("err_value"))
        graft.operators.TemporalJoin.asofJoin(clicks, errs, "user_id",
          "ts", "ts", Seq("ts", "err_value"))
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"),
            unix_micros(col("asof_ts")).as("asof_ts_us"),
            col("asof_err_value").as("asof_value"))
          .orderBy("event_id")
      },
      Some("""
        WITH clicks AS (
          SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click'),
        errs AS (
          SELECT user_id, ts, max(value) AS err_value FROM events
          WHERE event_type = 'error' GROUP BY 1, 2)
        SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
               epoch_us(e.ts) AS asof_ts_us, e.err_value AS asof_value
        FROM clicks c ASOF LEFT JOIN errs e
          ON c.user_id = e.user_id AND c.ts >= e.ts
        ORDER BY c.event_id""")),

    // ----- the SAME as-of enrichment via the broadcast form
    // (TemporalJoin.asofJoinBroadcast): the error series collapses to one
    // sorted history array per user, broadcast, and each click probes it
    // in-row — ZERO shuffle of the click stream (the scale shape when the
    // right side is a dimension series). Same DuckDB ASOF oracle as q64:
    // two independent implementations, one semantic.
    Q("q64b_asof_broadcast",
      (s, d) => {
        val ev = events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts")
        val errs = ev.filter(col("event_type") === "error")
          .groupBy("user_id", "ts").agg(max("value").as("err_value"))
        graft.operators.TemporalJoin.asofJoinBroadcast(clicks, errs,
          "user_id", "ts", "ts", Seq("ts", "err_value"))
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"),
            unix_micros(col("asof_ts")).as("asof_ts_us"),
            col("asof_err_value").as("asof_value"))
          .orderBy("event_id")
      },
      Some("""
        WITH clicks AS (
          SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click'),
        errs AS (
          SELECT user_id, ts, max(value) AS err_value FROM events
          WHERE event_type = 'error' GROUP BY 1, 2)
        SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
               epoch_us(e.ts) AS asof_ts_us, e.err_value AS asof_value
        FROM clicks c ASOF LEFT JOIN errs e
          ON c.user_id = e.user_id AND c.ts >= e.ts
        ORDER BY c.event_id""")),

    // ----- bounded range join (TemporalJoin.rangeJoin): clicks within 6
    // hours after each error, per user — time-bucketed so the
    // inequality is an equi-join on (user, bucket), never a nested loop.
    // Aggregated per error so the oracle checks the exact pair multiset.
    Q("q65_range_join",
      (s, d) => {
        val ev = events(s, d)
        val errs = ev.filter(col("event_type") === "error")
          .select("event_id", "user_id", "ts")
        val clicks = ev.filter(col("event_type") === "click")
          .select("user_id", "ts", "value")
        graft.operators.TemporalJoin.rangeJoin(errs, clicks, "user_id",
          "ts", "ts", widthSec = 21600L)
          .groupBy("event_id")
          .agg(count(lit(1)).as("n_clicks"),
            r2(sum("r_value")).as("click_value"))
          .orderBy("event_id")
      },
      Some("""
        SELECT e.event_id, count(*) AS n_clicks,
               round(sum(c.value), 2) AS click_value
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'error') e
        JOIN (SELECT user_id, ts, value FROM events
              WHERE event_type = 'click') c
          ON c.user_id = e.user_id
         AND c.ts >= e.ts
         AND epoch_us(c.ts) < epoch_us(e.ts) + 21600000000
        GROUP BY 1
        ORDER BY 1""")),

    // ----- multi-level aggregation: ROLLUP over (returnflag, linestatus)
    // with grouping_id — subtotals and the grand total in ONE pass
    // (Spark expands the grouping sets before the shuffle; partial
    // aggregation still applies per set, so this is one shuffle, not
    // three queries). Spark's grouping_id() bit pattern matches DuckDB's
    // GROUPING() exactly (0 = detail, 1 = per-flag subtotal, 3 = grand
    // total); NULL group keys are coalesced to a sentinel on both sides
    // so the hash compare sees identical strings.
    Q("q69_rollup_pricing",
      (s, d) =>
        lineitem(s, d)
          .rollup("l_returnflag", "l_linestatus")
          .agg(
            r2(sum("l_quantity")).as("sum_qty"),
            r2(sum("l_extendedprice")).as("sum_price"),
            count(lit(1)).as("n"),
            grouping_id().as("gid"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
            col("gid"), col("sum_qty"), col("sum_price"), col("n"))
          .orderBy("gid", "l_returnflag", "l_linestatus"),
      Some("""
        SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
               coalesce(l_linestatus, 'ALL') AS l_linestatus,
               grouping(l_returnflag, l_linestatus) AS gid,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_price,
               count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY gid, l_returnflag, l_linestatus""")),

    // ----- Z-order (Morton) clustering values (Layout.withZValue) — the
    // multi-dimensional at-rest locality layout. The min/max
    // discretization and 16-bit interleave are pure deterministic
    // arithmetic, so DuckDB replays every z-value; the file-locality
    // benefit of writeZOrdered is spec-asserted (fewer files touched
    // than an id-ordered layout for a box query).
    Q("q80_zorder_values",
      (s, d) =>
        graft.operators.Layout.withZValue(
          orders(s, d).select("o_orderkey", "o_totalprice", "o_custkey"),
          "o_totalprice", "o_custkey")
          .select(col("o_orderkey"), col("z"))
          .orderBy("o_orderkey"),
      Some("""
        WITH b AS (
          SELECT min(o_totalprice) AS mina, max(o_totalprice) AS maxa,
                 min(o_custkey) AS minb, max(o_custkey) AS maxb
          FROM orders),
        s AS (
          SELECT o_orderkey,
            CASE WHEN (maxa - mina) <= 0 THEN 0
                 ELSE least(greatest(floor(((o_totalprice - mina)
                        / (maxa - mina)) * 65535)::BIGINT, 0), 65535)
            END AS ai,
            CASE WHEN ((maxb - minb)::DOUBLE) <= 0 THEN 0
                 ELSE least(greatest(floor((((o_custkey - minb)::DOUBLE)
                        / ((maxb - minb)::DOUBLE)) * 65535)::BIGINT, 0),
                        65535)
            END AS bi
          FROM orders, b)
        SELECT o_orderkey,
               sum((((ai >> g.i) & 1) << (2 * g.i))
                 + (((bi >> g.i) & 1) << (2 * g.i + 1)))::BIGINT AS z
        FROM s, generate_series(0, 15) AS g(i)
        GROUP BY 1
        ORDER BY o_orderkey""")),

    // ----- equal-width histogram (Layout.histogram) — dataset profiling:
    // bucket bounds from a broadcast 1-row min/max, one
    // partial-aggregated groupBy over nBuckets keys. Both engines run
    // the identical IEEE discretization, so bucket assignment and bounds
    // compare value-for-value.
    Q("q81_histogram",
      (s, d) =>
        graft.operators.Layout.histogram(
          lineitem(s, d).select("l_extendedprice"),
          "l_extendedprice", nBuckets = 20)
          .orderBy("bucket"),
      Some("""
        WITH b AS (
          SELECT min(l_extendedprice) AS minv, max(l_extendedprice) AS maxv
          FROM lineitem),
        s AS (
          SELECT CASE WHEN (maxv - minv) <= 0 THEN 0
                      ELSE least(floor(((l_extendedprice - minv)
                             / (maxv - minv)) * 20)::BIGINT, 19)
                 END AS bucket,
                 minv, (maxv - minv) / 20 AS w
          FROM lineitem, b)
        SELECT bucket,
               round(min(minv + bucket * w), 4) AS lo,
               round(min(minv + (bucket + 1) * w), 4) AS hi,
               count(*)::BIGINT AS n
        FROM s
        GROUP BY bucket
        ORDER BY bucket""")),

    // ----- retention cohort matrix: users grouped by first-seen week ×
    // weeks they were active — the classic event-analytics rollup. Two
    // keyed aggregations and one join; weeks compare as UTC epoch
    // seconds (both engines truncate to Monday).
    Q("q82_retention_cohorts",
      (s, d) => {
        val ev = events(s, d)
        val weekly = ev.select(col("user_id"),
            date_trunc("week", col("ts")).as("wk"))
          .distinct()
        val firstWeek = weekly.groupBy("user_id")
          .agg(min("wk").as("cohort"))
        weekly.join(firstWeek, "user_id")
          .groupBy("cohort", "wk")
          .agg(count(lit(1)).as("n_users"))
          .select(
            unix_timestamp(col("cohort")).as("cohort_week"),
            unix_timestamp(col("wk")).as("active_week"),
            col("n_users"))
          .orderBy("cohort_week", "active_week")
      },
      Some("""
        WITH w AS (
          SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
          FROM events),
        fw AS (SELECT user_id, min(wk) AS cohort FROM w GROUP BY 1)
        SELECT epoch(cohort)::BIGINT AS cohort_week,
               epoch(wk)::BIGINT AS active_week,
               count(*)::BIGINT AS n_users
        FROM w JOIN fw USING (user_id)
        GROUP BY 1, 2
        ORDER BY 1, 2""")),

    // ----- exact grouped percentiles: per-event-type latency-style
    // quantiles of `value`. Spark's exact `percentile` and DuckDB's
    // `quantile_cont` both use the SQL-standard (n-1)·p linear
    // interpolation, so values match to the rounding. One
    // partial-aggregated groupBy; at volumes where exact sort-based
    // percentile is too heavy, q63b's approx_percentile sketch path is
    // the documented twin.
    Q("q93_group_percentiles",
      (s, d) => {
        val ev = events(s, d)
        ev.groupBy("event_type")
          .agg(expr("percentile(value, array(0.25D, 0.5D, 0.9D, 0.99D))")
            .as("pcts"))
          .select(col("event_type"),
            round(element_at(col("pcts"), 1), 6).as("p25"),
            round(element_at(col("pcts"), 2), 6).as("p50"),
            round(element_at(col("pcts"), 3), 6).as("p90"),
            round(element_at(col("pcts"), 4), 6).as("p99"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type,
               round(quantile_cont(value, 0.25), 6) AS p25,
               round(quantile_cont(value, 0.50), 6) AS p50,
               round(quantile_cont(value, 0.90), 6) AS p90,
               round(quantile_cont(value, 0.99), 6) AS p99
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // ----- strict-order funnel: view → click → purchase, each stage's
    // timestamp strictly after the previous stage's FIRST completion.
    // Three keyed min-aggregations chained by equi-joins on user — no
    // window, no ordering of the raw stream; each stage's input is
    // filtered map-side before its shuffle.
    Q("q94_funnel",
      (s, d) => {
        val ev = events(s, d)
        def stage(tpe: String) = ev
          .filter(col("event_type") === tpe)
          .select(col("user_id"), col("ts"))
        val s1 = stage("view").groupBy("user_id").agg(min("ts").as("t1"))
        val s2 = stage("click").join(s1, "user_id")
          .filter(col("ts") > col("t1"))
          .groupBy("user_id").agg(min("ts").as("t2"))
        val s3 = stage("purchase").join(s2, "user_id")
          .filter(col("ts") > col("t2"))
          .groupBy("user_id").agg(min("ts").as("t3"))
        val counts = Seq(
          ("1_view", s1), ("2_click", s2), ("3_purchase", s3))
        counts.map { case (name, df) =>
          df.agg(count(lit(1)).as("n_users"))
            .select(lit(name).as("stage"), col("n_users"))
        }.reduce(_ union _).orderBy("stage")
      },
      Some("""
        WITH s1 AS (
          SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY 1),
        s2 AS (
          SELECT e.user_id, min(e.ts) AS t2
          FROM events e JOIN s1 USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > s1.t1
          GROUP BY 1),
        s3 AS (
          SELECT e.user_id, min(e.ts) AS t3
          FROM events e JOIN s2 USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > s2.t2
          GROUP BY 1)
        SELECT stage, n_users FROM (
          SELECT '1_view' AS stage, count(*)::BIGINT AS n_users FROM s1
          UNION ALL
          SELECT '2_click', count(*)::BIGINT FROM s2
          UNION ALL
          SELECT '3_purchase', count(*)::BIGINT FROM s3)
        ORDER BY stage""")),

    // ----- column profiler (Layout.profile): the dataset-card
    // summary — null counts, exact distinct cardinality and value range
    // for five orders columns. Exact mode runs one aggregation PER
    // COLUMN, unioned (a single multi-distinct aggregate would go
    // through RewriteDistinctAggregates, whose plan permutes with the
    // session exprId counter — r13 BENCH_NOTES); the approximate=true
    // HLL form is the one-pass 100 TB twin (q63b discipline).
    Q("q95_profile",
      (s, d) => {
        graft.operators.Layout.profile(fanOut(orders(s, d)),
          Seq("o_orderkey", "o_custkey", "o_orderstatus",
            "o_orderpriority", "o_orderdate"))
          .orderBy("column")
      },
      Some(Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_orderpriority", "o_orderdate").map { c =>
        s"""SELECT '$c' AS "column",
               count(*) - count($c) AS n_nulls,
               count(DISTINCT $c) AS n_distinct,
               min($c)::VARCHAR AS min_value,
               max($c)::VARCHAR AS max_value
           FROM orders"""
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
        "\n) ORDER BY \"column\""))),

    // ----- distribution drift monitor (Layout.driftScore): the doc_id%3
    // slice as the "new batch" vs the rest as reference, language mix,
    // additive smoothing 0.5 over the union of groups. Counts, smoothed
    // shares and every KL term value-checked; sum(kl_term) is the alarm
    // number.
    Q("q97_drift_score",
      (s, d) => {
        val docs = documents(s, d)
        graft.operators.Layout.driftScore(
          docs.filter(col("doc_id") % 3 === 0),
          docs.filter(col("doc_id") % 3 =!= 0), "lang")
          .orderBy("lang")
      },
      Some("""
        WITH c AS (
          SELECT lang, count(*) AS n_cur FROM documents
          WHERE doc_id % 3 = 0 GROUP BY 1),
        r AS (
          SELECT lang, count(*) AS n_ref FROM documents
          WHERE doc_id % 3 != 0 GROUP BY 1),
        j AS (
          -- null-safe group join, mirroring the engine's <=> (r14): a
          -- NULL group present on both sides is ONE group, not two
          SELECT coalesce(c.lang, r.lang) AS lang,
                 coalesce(n_cur, 0) AS n_cur,
                 coalesce(n_ref, 0) AS n_ref
          FROM c FULL OUTER JOIN r
            ON c.lang IS NOT DISTINCT FROM r.lang),
        t AS (SELECT sum(n_cur)::DOUBLE AS tc, sum(n_ref)::DOUBLE AS tr,
                     count(*)::DOUBLE AS g
              FROM j)
        SELECT lang, n_cur, n_ref,
               round((n_cur + 0.5) / (tc + g * 0.5), 6) AS p_cur,
               round((n_ref + 0.5) / (tr + g * 0.5), 6) AS p_ref,
               round(((n_cur + 0.5) / (tc + g * 0.5)) *
                 ln(((n_cur + 0.5) / (tc + g * 0.5)) /
                    ((n_ref + 0.5) / (tr + g * 0.5))), 6) AS kl_term
        FROM j, t
        ORDER BY lang"""))
  )

  // ==========================================================================
  // Text-analysis / dedup operators over `documents` (north-star §7.1.8).
  // Implementations live in graft.operators.*; these entries wire them to
  // the oracle. Filled in by the TextAnalysis/Dedup milestone.
  // ==========================================================================
  private[graft] def text: Seq[Q] = TextQueries.all

  // Similarity / embeddings queries (filled by Similarity milestone).
  private[graft] def similarity: Seq[Q] = SimilarityQueries.all
}
