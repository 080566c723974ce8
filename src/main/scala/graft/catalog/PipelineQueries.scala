package graft.catalog

import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis, TimeSeries, Warehouse, WebGraph}

/** Round-8 pipeline-plane catalog entries: graph structure (communities,
  * triangles, reachability, co-visitation), feed time-series anomaly
  * detection, and warehouse maintenance (SCD2 / CDC merge / k-anonymity).
  * Same determinism contract as [[Queries]]: total-order sort, late
  * rounding, unrolled fixed-iteration oracles.
  */
object PipelineQueries {
  import Tables._

  /** The q120/q122 synthesized host link graph, reused for every graph
    * entry: source host → doc-derived host, self-loops removed. */
  private def hostEdges(s: org.apache.spark.sql.SparkSession, d: String) =
    documents(s, d).select(col("source").as("src"),
        concat(lit("src"),
          ((col("doc_id") * col("doc_id") + 1) % 13)).as("dst"))
      .filter(col("src") =!= col("dst"))

  private val edgesCte: String = """edges AS (
          SELECT source AS src, 'src' || ((doc_id * doc_id + 1) % 13) AS dst
          FROM documents
          WHERE source != 'src' || ((doc_id * doc_id + 1) % 13)),
        und AS MATERIALIZED (
          SELECT DISTINCT a, b FROM (
            SELECT src AS a, dst AS b FROM edges
            UNION ALL SELECT dst, src FROM edges)
          WHERE a != b)"""

  private[graft] def ops: Seq[Q] = Seq(

    // ----- q123: synchronous label-propagation communities
    // (WebGraph.labelPropagation) — mirror-farm clustering. 3 unrolled
    // rounds; most-frequent neighbor label, min-label tie-break.
    Q("q123_label_propagation",
      (s, d) =>
        WebGraph.labelPropagation(hostEdges(s, d), iters = 3)
          .orderBy("node"),
      Some(labelPropOracle(3))),

    // ----- q124: triangle count + clustering coefficient
    // (WebGraph.triangleStats) — link-farm shape signal. Canonical
    // a<b<c enumeration on both engines.
    Q("q124_triangles",
      (s, d) =>
        WebGraph.triangleStats(hostEdges(s, d)).orderBy("node"),
      Some(s"""
        WITH $edgesCte,
        ce AS MATERIALIZED (SELECT a, b FROM und WHERE a < b),
        tri AS MATERIALIZED (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM ce e1 JOIN ce e2 ON e1.b = e2.a
          WHERE EXISTS (SELECT 1 FROM ce e3
                        WHERE e3.a = e1.a AND e3.b = e2.b)),
        pn AS (
          SELECT node, count(*) AS triangles FROM (
            SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri)
          GROUP BY 1),
        deg AS (SELECT a AS node, count(*) AS degree FROM und GROUP BY 1)
        SELECT d.node, d.degree, coalesce(pn.triangles, 0) AS triangles,
               round(CASE WHEN d.degree >= 2
                 THEN 2.0 * coalesce(pn.triangles, 0)
                      / (d.degree * (d.degree - 1))
                 ELSE 0 END, 4) AS clustering
        FROM deg d LEFT JOIN pn USING (node)
        ORDER BY node""")),

    // ----- q125: bounded-hop BFS reachability (WebGraph.khopDistances)
    // — the spam-seed expansion drop list; min hop distance along
    // directed edges, 3 unrolled hops from a fixed seed set.
    Q("q125_khop_reach",
      (s, d) => {
        import s.implicits._
        val seeds = Seq("src1", "src4").toDF("node")
        WebGraph.khopDistances(hostEdges(s, d), seeds, maxHops = 3)
          .orderBy("node")
      },
      Some(khopOracle(3))),

    // ----- q126: daily-volume spike detection (TimeSeries.spikeDetect)
    // — feed anomaly gate; trailing-7-day rolling z-score, baseline
    // excludes the judged day, cold start (<3 prior days) is never a
    // spike.
    Q("q126_spike_detection",
      (s, d) =>
        TimeSeries.spikeDetect(events(s, d)).orderBy("key", "day"),
      Some("""
        WITH daily AS (
          SELECT event_type AS key, date_trunc('day', ts)::DATE AS day,
                 count(*) AS n,
                 date_trunc('day', ts)::DATE - DATE '1970-01-01' AS ord
          FROM events GROUP BY 1, 2, 4),
        w AS (
          SELECT key, day, n,
                 avg(n) OVER tw AS mu,
                 stddev_samp(n) OVER tw AS sd,
                 count(*) OVER tw AS prior
          FROM daily
          WINDOW tw AS (PARTITION BY key ORDER BY ord
                        RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        z AS (
          SELECT key, day, n, mu,
                 CASE WHEN prior >= 3 AND sd > 0
                      THEN (n - mu) / sd END AS zraw
          FROM w)
        SELECT key, day, n, round(mu, 4) AS mu, round(zraw, 4) AS z,
               coalesce(zraw > 3, false) AS spike
        FROM z
        ORDER BY key, day""")),

    // ----- q127: Markov event-transition matrix
    // (TimeSeries.eventTransitions) — behavioral fingerprint; lead()
    // over the (ts, event_id) total order per user, then |states|²-scale
    // probability table.
    Q("q127_markov_transitions",
      (s, d) =>
        TimeSeries.eventTransitions(events(s, d))
          .orderBy("from_type", "to_type"),
      Some("""
        WITH s AS (
          SELECT event_type AS from_type,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS to_type
          FROM events),
        t AS (
          SELECT from_type, to_type, count(*) AS n
          FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2)
        SELECT from_type, to_type, n,
               round(n / sum(n) OVER (PARTITION BY from_type), 4) AS p
        FROM t
        ORDER BY from_type, to_type""")),

    // ----- q128: co-visitation similarity (WebGraph.covisitation) —
    // audience-overlap near-duplicate signal over the events (user,
    // props.k) interactions; per-user top-20 cap bounds the self-join,
    // pairs under 2 co-users dropped.
    Q("q128_covisitation",
      (s, d) => {
        val inter = events(s, d)
          .select(col("user_id"),
            regexp_extract(col("props"), "([0-9]+)", 1).cast("int")
              .as("item"))
          .filter(col("item").isNotNull)
        WebGraph.covisitation(inter).orderBy("item_a", "item_b")
      },
      Some("""
        WITH ui AS (
          SELECT user_id,
                 try_cast(regexp_extract(props, '([0-9]+)', 1) AS INT)
                   AS item,
                 count(*) AS f
          FROM events
          WHERE try_cast(regexp_extract(props, '([0-9]+)', 1) AS INT)
                IS NOT NULL
          GROUP BY 1, 2),
        capped AS MATERIALIZED (
          SELECT user_id, item FROM (
            SELECT user_id, item,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY f DESC, item) AS rn
            FROM ui) WHERE rn <= 20),
        iu AS (SELECT item, count(*) AS n FROM capped GROUP BY 1),
        p AS (
          SELECT l.item AS item_a, r.item AS item_b, count(*) AS co
          FROM capped l JOIN capped r
            ON l.user_id = r.user_id AND l.item < r.item
          GROUP BY 1, 2 HAVING count(*) >= 2)
        SELECT item_a, item_b, co,
               round(co / sqrt(na.n * nb.n), 4) AS cosine
        FROM p
        JOIN iu na ON na.item = p.item_a
        JOIN iu nb ON nb.item = p.item_b
        ORDER BY item_a, item_b""")),

    // ----- q129: SCD2 interval build (Warehouse.scd2Intervals) —
    // gaps-and-islands over each customer's order-status log; half-open
    // [valid_from, valid_to) intervals, NULL valid_to = current.
    Q("q129_scd2_intervals",
      (s, d) =>
        // (key, valid_from, value) alone is not a total order — a status
        // that flips A→B→A within one o_orderdate yields two islands
        // identical on those three but different on valid_to/n_rows;
        // append both (NULLS LAST to match the oracle's ASC default) so
        // both engines emit one order and the hash compare can't flake.
        Warehouse.scd2Intervals(orders(s, d), "o_custkey",
          "o_orderstatus", "o_orderdate", "o_orderkey")
          .orderBy(col("key"), col("valid_from"), col("value"),
            col("valid_to").asc_nulls_last, col("n_rows")),
      Some("""
        WITH ord AS (
          SELECT o_custkey AS key, o_orderstatus AS value,
                 o_orderdate AS ts, o_orderkey AS tie,
                 lag(o_orderstatus) OVER w AS prev,
                 row_number() OVER w AS rn
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey)),
        flagged AS (
          -- null-safe change detection, first row by rn (the engine's
          -- row_number + <=> form): a NULL tracked value is a real
          -- island, not "no previous row"
          SELECT *, CASE WHEN rn = 1 OR prev IS DISTINCT FROM value
                         THEN 1 ELSE 0 END AS chg
          FROM ord),
        grp AS (
          SELECT *, sum(chg) OVER (PARTITION BY key ORDER BY ts, tie
                                   ROWS UNBOUNDED PRECEDING) AS g
          FROM flagged),
        isl AS (
          SELECT key, g, min(value) AS value, min(ts) AS valid_from,
                 count(*) AS n_rows
          FROM grp GROUP BY 1, 2),
        fin AS (
          SELECT key, value, valid_from,
                 lead(valid_from) OVER (PARTITION BY key ORDER BY g)
                   AS valid_to,
                 n_rows
          FROM isl)
        SELECT key, value, valid_from, valid_to, n_rows,
               valid_to IS NULL AS is_current
        FROM fin
        ORDER BY key, valid_from, value, valid_to ASC NULLS LAST,
                 n_rows""")),

    // ----- q130: batch CDC merge (Warehouse.cdcMerge) — MERGE INTO
    // semantics as one full-outer key join; change set synthesized
    // deterministically from orders (D: key%10=0, U: key%10∈{1,2} price
    // ×1.1, I: key%10=3 shifted key).
    Q("q130_cdc_merge",
      (s, d) => {
        val o = orders(s, d)
        val del = o.filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"), lit("D").as("op"),
            col("o_orderstatus"), col("o_totalprice"))
        // the ×1.1 update is emitted UNROUNDED: o_totalprice is a
        // parquet double, so both engines multiply identical bits by
        // the identical 1.1 double — round(·, 2) here lands on decimal
        // .5 boundaries where the two engines' rounding modes diverge.
        val upd = o.filter((col("o_orderkey") % 10).isin(1, 2))
          .select(col("o_orderkey"), lit("U").as("op"),
            col("o_orderstatus"),
            (col("o_totalprice") * 1.1).as("o_totalprice"))
        val ins = o.filter(col("o_orderkey") % 10 === 3)
          .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
            lit("I").as("op"), col("o_orderstatus"), col("o_totalprice"))
        val changes = del.unionByName(upd).unionByName(ins)
        Warehouse.cdcMerge(o, changes, "o_orderkey",
            Seq("o_orderstatus", "o_totalprice"))
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"))
          .orderBy("o_orderkey")
      },
      Some("""
        WITH changes AS (
          SELECT o_orderkey, 'D' AS op, o_orderstatus, o_totalprice
          FROM orders WHERE o_orderkey % 10 = 0
          UNION ALL
          SELECT o_orderkey, 'U', o_orderstatus,
                 o_totalprice * 1.1
          FROM orders WHERE o_orderkey % 10 IN (1, 2)
          UNION ALL
          SELECT o_orderkey + 100000000, 'I', o_orderstatus, o_totalprice
          FROM orders WHERE o_orderkey % 10 = 3)
        SELECT o_orderkey,
               CASE WHEN c.op IN ('U', 'I') THEN c.o_orderstatus
                    ELSE b.o_orderstatus END AS o_orderstatus,
               CASE WHEN c.op IN ('U', 'I') THEN c.o_totalprice
                    ELSE b.o_totalprice END AS o_totalprice
        FROM orders b FULL JOIN changes c USING (o_orderkey)
        WHERE coalesce(c.op != 'D', true)
        ORDER BY o_orderkey""")),

    // ----- q131: k-anonymity small-cell suppression
    // (Warehouse.kanonSuppress) — corpus-composition release form:
    // (source, lang) cells under k=5 generalized to '*' and
    // re-aggregated.
    Q("q131_kanon_suppress",
      (s, d) =>
        Warehouse.kanonSuppress(documents(s, d), Seq("source", "lang"),
          k = 5).orderBy("source", "lang"),
      Some("""
        WITH cells AS (
          SELECT source, lang, count(*) AS n
          FROM documents GROUP BY 1, 2),
        g AS (
          -- suppressed travels as its own flag from the cell-size
          -- decision (the engine's form): never re-derived from the
          -- '*' sentinel, so NULL QIs and literal '*' data stay honest
          SELECT CASE WHEN n >= 5 THEN source ELSE '*' END AS source,
                 CASE WHEN n >= 5 THEN lang ELSE '*' END AS lang, n,
                 (n < 5) AS suppressed
          FROM cells)
        SELECT source, lang, sum(n)::BIGINT AS n, suppressed
        FROM g GROUP BY source, lang, suppressed
        ORDER BY source, lang""")),

    // ----- q132: bucketed co-located join (Bucketing.cojoin) — both
    // sides written bucketed+sorted on the join key, joined with ZERO
    // exchanges (BucketingSpec pins the plan). The oracle only checks
    // values — bucketing must never change results.
    Q("q132_bucketed_join",
      (s, d) =>
        graft.sources.Bucketing.cojoin(
            orders(s, d), "o_custkey", customer(s, d), "c_custkey",
            nBuckets = 8,
            dir = java.nio.file.Files
              .createTempDirectory("graft_bucketed_").toString)
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            round(sum("o_totalprice"), 2).as("revenue"))
          .orderBy("c_mktsegment"),
      Some("""
        SELECT c_mktsegment, count(*) AS n,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1
        ORDER BY 1""")),

    // ----- q133: C4-style global sentence dedup, keep-first
    // (TextAnalysis.sentenceDedup) — sentence boundaries synthesized
    // deterministically (the word ' table ' becomes '. ') since harness
    // text has no punctuation; boilerplate sentences collapse to their
    // first (doc_id, pos) occurrence and docs are reassembled.
    Q("q133_sentence_dedup",
      (s, d) =>
        graft.operators.TextAnalysis.sentenceDedup(
          documents(s, d).withColumn("text",
            regexp_replace(col("text"), "\\stable\\s", ". ")))
          .orderBy("doc_id"),
      Some("""
        WITH docs2 AS (
          SELECT doc_id, regexp_replace(text, '\stable\s', '. ', 'g')
                   AS text
          FROM documents),
        arrs AS (
          SELECT doc_id, regexp_split_to_array(text, '\.\s+') AS arr
          FROM docs2),
        s AS (
          -- parallel unnests zip: sentence with its 1-based position
          -- (Spark's posexplode is 0-based; only relative order matters)
          SELECT doc_id, trim(unnest(arr)) AS sent,
                 unnest(generate_series(1, len(arr))) AS pos
          FROM arrs),
        s2 AS (SELECT * FROM s WHERE sent != ''),
        -- totals anchor on the input docs (r15): a doc with no non-empty
        -- sentence still comes back, with 0 counts and empty text
        tot AS (
          SELECT d.doc_id, coalesce(c.n, 0) AS n_total
          FROM docs2 d LEFT JOIN (
            SELECT doc_id, count(*) AS n FROM s2 GROUP BY 1) c
          USING (doc_id)),
        firsts AS (
          SELECT doc_id, pos, sent FROM (
            SELECT doc_id, pos, sent,
                   row_number() OVER (PARTITION BY sent
                                      ORDER BY doc_id, pos) AS rn
            FROM s2) WHERE rn = 1),
        kept AS (
          SELECT doc_id, count(*) AS n_kept,
                 string_agg(sent, '. ' ORDER BY pos) AS text_dedup
          FROM firsts GROUP BY 1)
        SELECT t.doc_id, coalesce(k.text_dedup, '') AS text_dedup,
               coalesce(k.n_kept, 0) AS n_kept, t.n_total
        FROM tot t LEFT JOIN kept k USING (doc_id)
        ORDER BY doc_id""")),

    // ----- q134: zone-map pruning effectiveness
    // (Layout.zoneMapSkipStats) — per-shard min/max skipping for range
    // predicates under the natural (doc_id) vs value-clustered layout;
    // the decide-before-rewrite companion to q80's z-order.
    Q("q134_zonemap_prune",
      (s, d) =>
        graft.operators.Layout.zoneMapSkipStats(documents(s, d),
            valueCol = "n_chars", orderCol = "doc_id", nShards = 20,
            preds = Seq((0.0, 100.0), (200.0, 260.0), (500.0, 10000.0)))
          .orderBy("layout", "pred_id"),
      Some("""
        WITH b AS (
          SELECT min(doc_id)::DOUBLE AS min_o, max(doc_id)::DOUBLE AS max_o,
                 min(n_chars)::DOUBLE AS min_v, max(n_chars)::DOUBLE AS max_v
          FROM documents),
        z AS (
          SELECT 'natural' AS layout,
                 least(CASE WHEN max_o - min_o <= 0 THEN 0
                       ELSE floor((doc_id - min_o) / (max_o - min_o) * 20)
                       END, 19)::BIGINT AS shard,
                 n_chars
          FROM documents, b
          UNION ALL
          SELECT 'clustered',
                 least(CASE WHEN max_v - min_v <= 0 THEN 0
                       ELSE floor((n_chars - min_v) / (max_v - min_v) * 20)
                       END, 19)::BIGINT,
                 n_chars
          FROM documents, b),
        zones AS (
          SELECT layout, shard, min(n_chars)::DOUBLE AS zmin,
                 max(n_chars)::DOUBLE AS zmax
          FROM z GROUP BY 1, 2),
        preds AS (
          SELECT * FROM (VALUES (0, 0.0, 100.0), (1, 200.0, 260.0),
                                (2, 500.0, 10000.0)) p(pred_id, lo, hi))
        SELECT layout, pred_id, lo, hi, count(*) AS n_shards,
               sum(CASE WHEN zmax < lo OR zmin > hi THEN 1 ELSE 0 END)
                 ::BIGINT AS n_skipped,
               round(sum(CASE WHEN zmax < lo OR zmin > hi THEN 1 ELSE 0
                         END) / count(*), 4) AS skip_frac
        FROM zones CROSS JOIN preds
        GROUP BY 1, 2, 3, 4
        ORDER BY layout, pred_id""")),

    // ----- q135: leakage-free group-aware split (Dedup.groupAwareSplit)
    // — the eval-contamination guard: the md5 bucket split is applied to
    // the near-duplicate COMPONENT id, so a doc and its mirror always
    // land on the same side. Components replayed in DuckDB exactly as
    // q37 does (recursive min-label CTE over portable LSH pairs).
    Q("q135_groupaware_split",
      (s, d) => {
        val docs = documents(s, d)
        val comps = graft.operators.Dedup.nearDupComponents(
          graft.operators.Dedup.lshCandidatePairs(docs, numHashes = 16,
            bands = 4, portable = true))
        graft.operators.Dedup.groupAwareSplit(docs, comps,
          trainFrac = 0.9).orderBy("doc_id")
      },
      benchRun = Some((s, d) => {
        // production configuration: xxhash64 LSH features (the md5 path
        // above exists so DuckDB can replay the components — q37b
        // precedent)
        val docs = documents(s, d)
        val comps = graft.operators.Dedup.nearDupComponents(
          graft.operators.Dedup.lshCandidatePairs(docs, numHashes = 16,
            bands = 4, portable = false))
        graft.operators.Dedup.groupAwareSplit(docs, comps,
          trainFrac = 0.9).orderBy("doc_id")
      }),
      oracle = Some(s"""
        WITH RECURSIVE ${TextQueries.minhashCtes},
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
          WHERE a.doc_id < b.doc_id),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b, id_a FROM pairs),
        r(id, root) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.dst, r.root FROM r JOIN edges e ON e.src = r.id),
        comp AS (SELECT id, min(root) AS component FROM r GROUP BY id)
        SELECT d.doc_id,
               coalesce(c.component, d.doc_id) AS group_id,
               CASE WHEN CAST(('0x' || substr(md5(
                        coalesce(c.component, d.doc_id)::VARCHAR), 1, 4))
                        AS INT) < ${(0.9 * 65536).toInt}
                    THEN 'train' ELSE 'valid' END AS split
        FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
        ORDER BY d.doc_id""")),

    // ----- q136: schema-evolution read (DocSource.readEvolved) — two
    // parquet generations with different schemas (lang added later)
    // written by our writer, read back as one frame via mergeSchema;
    // the oracle recomputes the expected union from the base table, so
    // it checks the whole round trip.
    Q("q136_schema_evolution",
      (s, d) => {
        val docs = documents(s, d)
        docs.filter(col("doc_id") < 250).select("doc_id", "n_chars")
          .coalesce(1).write.mode("overwrite")
          .parquet("/tmp/graft_evo/g1")
        docs.filter(col("doc_id") >= 250)
          .select("doc_id", "n_chars", "lang")
          .coalesce(1).write.mode("overwrite")
          .parquet("/tmp/graft_evo/g2")
        graft.sources.DocSource.readEvolved(s,
            "/tmp/graft_evo/g1", "/tmp/graft_evo/g2")
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id, n_chars,
               CASE WHEN doc_id < 250 THEN NULL ELSE lang END AS lang
        FROM documents
        ORDER BY doc_id""")),

    // ----- q137: incremental stats maintenance (Warehouse.partialStats
    // / mergeStats / finalizeStats) — per-source summary kept as an
    // ALGEBRAIC state: two disjoint batches aggregated separately, then
    // state-merged; the oracle aggregates the whole table at once, so a
    // pass proves merge associativity end-to-end.
    Q("q137_stats_merge",
      (s, d) => {
        val docs = documents(s, d)
        val b1 = graft.operators.Warehouse.partialStats(
          docs.filter(col("doc_id") < 250), "source", "n_chars")
        val b2 = graft.operators.Warehouse.partialStats(
          docs.filter(col("doc_id") >= 250), "source", "n_chars")
        graft.operators.Warehouse.finalizeStats(
            graft.operators.Warehouse.mergeStats(b1, b2))
          .orderBy("g")
      },
      Some("""
        SELECT source AS g, count(*)::BIGINT AS n,
               sum(n_chars)::BIGINT AS s,
               round(sum(n_chars) / count(n_chars), 4) AS avg,
               min(n_chars) AS mn, max(n_chars) AS mx
        FROM documents GROUP BY 1
        ORDER BY 1""")),

    // ----- q138: join-key skew diagnosis (SkewJoin.skewReport) — the
    // decide-before-you-shuffle report (per-key counts → exact
    // percentiles, max/avg skew ratio, suggested salt count) for two
    // very different key profiles.
    Q("q138_skew_report",
      (s, d) =>
        graft.operators.SkewJoin.skewReport(orders(s, d), "o_custkey")
          .unionByName(
            graft.operators.SkewJoin.skewReport(lineitem(s, d),
              "l_orderkey"))
          .orderBy("key_col"),
      Some("""
        WITH c1 AS (
          SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY 1),
        c2 AS (
          SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
        r1 AS (
          SELECT 'o_custkey' AS key_col, count(*)::BIGINT AS n_keys,
                 sum(c)::BIGINT AS n_rows, round(avg(c), 4) AS avg_rows,
                 round(quantile_cont(c, 0.5), 4) AS p50,
                 round(quantile_cont(c, 0.9), 4) AS p90,
                 max(c)::BIGINT AS max_rows,
                 round(max(c) / (sum(c) / count(*)), 4) AS skew_ratio,
                 ceil(round(max(c) / (sum(c) / count(*)), 6))::BIGINT
                   AS suggested_salts
          FROM c1),
        r2 AS (
          SELECT 'l_orderkey', count(*)::BIGINT, sum(c)::BIGINT,
                 round(avg(c), 4), round(quantile_cont(c, 0.5), 4),
                 round(quantile_cont(c, 0.9), 4), max(c)::BIGINT,
                 round(max(c) / (sum(c) / count(*)), 4),
                 ceil(round(max(c) / (sum(c) / count(*)), 6))::BIGINT
          FROM c2)
        SELECT * FROM r1 UNION ALL SELECT * FROM r2
        ORDER BY key_col""")),

    // ----- q139: last-touch attribution (TimeSeries
    // .lastTouchAttribution) — each purchase credited to the latest
    // click/view by the same user within 24 h; out-of-window conversions
    // surface with NULL touch (the join condition, not a post-filter,
    // carries the window).
    Q("q139_attribution",
      (s, d) =>
        TimeSeries.lastTouchAttribution(events(s, d)).orderBy("conv_id"),
      Some("""
        WITH conv AS (
          SELECT user_id AS u, event_id AS conv_id, ts AS conv_ts
          FROM events WHERE event_type = 'purchase'),
        touch AS (
          SELECT user_id AS u, event_id AS touch_id,
                 event_type AS touch_type, ts AS touch_ts
          FROM events WHERE event_type IN ('click', 'view')),
        cand AS (
          SELECT c.conv_id, c.conv_ts, t.touch_id, t.touch_type,
                 t.touch_ts
          FROM conv c LEFT JOIN touch t
            ON c.u = t.u
           AND epoch_us(t.touch_ts) <= epoch_us(c.conv_ts)
           AND epoch_us(t.touch_ts) > epoch_us(c.conv_ts) - 86400000000),
        r AS (
          SELECT *, row_number() OVER (
                   PARTITION BY conv_id
                   ORDER BY (touch_ts IS NULL), epoch_us(touch_ts) DESC,
                            touch_id DESC) AS rn
          FROM cand)
        SELECT conv_id, conv_ts, touch_id, touch_type,
               round((epoch_us(conv_ts) - epoch_us(touch_ts))
                     / 60000000.0, 2) AS mins_before
        FROM r WHERE rn = 1
        ORDER BY conv_id""")),

    // ----- q140: conversion-lag summary (TimeSeries.conversionLag) —
    // signup→purchase conversion rate and exact p50/p90 minutes from
    // first signup to first subsequent purchase; one row.
    Q("q140_conversion_lag",
      (s, d) => TimeSeries.conversionLag(events(s, d)),
      Some("""
        WITH ff AS (
          SELECT user_id AS u, min(ts) AS from_ts
          FROM events WHERE event_type = 'signup' GROUP BY 1),
        tos AS (
          SELECT user_id, ts AS to_ts
          FROM events WHERE event_type = 'purchase'),
        lags AS (
          SELECT u, from_ts, min(to_ts) AS first_to
          FROM ff LEFT JOIN tos
            ON ff.u = tos.user_id
           AND epoch_us(to_ts) >= epoch_us(from_ts)
          GROUP BY 1, 2),
        l2 AS (
          SELECT *, (epoch_us(first_to) - epoch_us(from_ts))
                    / 60000000.0 AS lag_mins
          FROM lags)
        SELECT count(*)::BIGINT AS n_users,
               count(first_to)::BIGINT AS n_converted,
               round(count(first_to) / count(*), 4) AS cvr,
               round(quantile_cont(lag_mins, 0.5), 2) AS p50_mins,
               round(quantile_cont(lag_mins, 0.9), 2) AS p90_mins
        FROM l2""")),

    // ----- q141: per-event lag/rolling features (TimeSeries
    // .lagFeatures) — prev value, delta, trailing-3 mean per user in
    // (ts, event_id) order; the feature-store shape, all windows
    // user-partitioned.
    Q("q141_lag_features",
      (s, d) => TimeSeries.lagFeatures(events(s, d)).orderBy("event_id"),
      Some("""
        SELECT event_id, user_id, value,
               lag(value) OVER w AS prev_value,
               round(value - lag(value) OVER w, 4) AS delta,
               round(avg(value) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id
                     ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 4)
                 AS roll3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id""")),

    // ----- q142: merged-interval activity coverage (TimeSeries
    // .intervalCoverage) — events padded to 30-min intervals, overlaps
    // merged via trailing cummax gaps-and-islands, per-user island count
    // + exact covered minutes.
    Q("q142_interval_coverage",
      (s, d) => TimeSeries.intervalCoverage(events(s, d))
        .orderBy("user_id"),
      Some("""
        WITH iv AS (
          SELECT user_id, event_id, epoch_us(ts) AS s,
                 epoch_us(ts) + 1800000000 AS e
          FROM events),
        m AS (
          SELECT *, max(e) OVER (PARTITION BY user_id
                   ORDER BY s, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS prev_max
          FROM iv),
        f AS (
          SELECT *, CASE WHEN prev_max IS NULL OR s > prev_max
                         THEN 1 ELSE 0 END AS ni
          FROM m),
        g AS (
          SELECT *, sum(ni) OVER (PARTITION BY user_id
                   ORDER BY s, event_id ROWS UNBOUNDED PRECEDING)
                 AS island
          FROM f),
        isl AS (
          SELECT user_id, island, min(s) AS is_s, max(e) AS is_e
          FROM g GROUP BY 1, 2)
        SELECT user_id, count(*)::BIGINT AS n_intervals,
               round(sum(is_e - is_s) / 60000000.0, 2) AS covered_mins
        FROM isl GROUP BY 1
        ORDER BY user_id""")),

    // ----- q143: Otsu auto-threshold (TextAnalysis.otsuThreshold) —
    // parameter-free quality cutoff: the 20-bucket histogram cut that
    // maximizes between-class variance over documents.n_chars. Discrete
    // Otsu over bucket indices (integer-weighted sums both engines
    // compute identically).
    Q("q143_otsu_threshold",
      (s, d) =>
        TextAnalysis.otsuThreshold(documents(s, d), "n_chars",
          nBuckets = 20),
      Some("""
        WITH b AS (
          SELECT min(n_chars) AS minv, max(n_chars) AS maxv
          FROM documents),
        s AS (
          SELECT CASE WHEN (maxv - minv) <= 0 THEN 0
                      ELSE least(floor(((n_chars - minv)
                             / (maxv - minv)) * 20)::BIGINT, 19)
                 END AS bucket,
                 minv, (maxv - minv) / 20.0 AS w
          FROM documents, b),
        hist AS (
          SELECT bucket,
                 round(min(minv + (bucket + 1) * w), 4) AS hi,
                 count(*) AS n
          FROM s GROUP BY bucket),
        tot AS (
          SELECT sum(n) AS tn, sum(n * bucket) AS ti FROM hist),
        cum AS (
          SELECT bucket, hi, n,
                 sum(n) OVER (ORDER BY bucket
                              ROWS UNBOUNDED PRECEDING) AS w0,
                 sum(n * bucket) OVER (ORDER BY bucket
                              ROWS UNBOUNDED PRECEDING) AS i0
          FROM hist),
        v AS (
          SELECT bucket, hi, w0, tn - w0 AS w1,
                 CASE WHEN w0 > 0 AND tn - w0 > 0
                      THEN w0::DOUBLE * (tn - w0)::DOUBLE *
                           pow(i0 / w0 - (ti - i0) / (tn - w0), 2)
                 END AS varb
          FROM cum, tot)
        SELECT bucket AS threshold_bucket, hi AS threshold_value,
               w0::BIGINT AS n_below, w1::BIGINT AS n_above,
               round(varb, 4) AS var_between
        FROM v WHERE varb IS NOT NULL
        ORDER BY round(varb, 6) DESC, bucket
        LIMIT 1""")),

    // ----- q144: join-cardinality prediction (SkewJoin
    // .joinCardinalityReport) — Σ c_l(k)·c_r(k) from the two per-key
    // histograms; the ORACLE computes the actual lineitem⋈orders join
    // count, so a green row proves the predictor exact without Spark
    // ever running the join.
    Q("q144_join_cardinality",
      (s, d) =>
        graft.operators.SkewJoin.joinCardinalityReport(
          lineitem(s, d), "l_orderkey", orders(s, d), "o_orderkey"),
      Some("""
        WITH lc AS (
          SELECT l_orderkey AS k, count(*) AS cl
          FROM lineitem GROUP BY 1),
        rc AS (
          SELECT o_orderkey AS k, count(*) AS cr
          FROM orders GROUP BY 1),
        j AS (SELECT cl, cr FROM lc JOIN rc USING (k))
        SELECT count(*)::BIGINT AS n_shared_keys,
               (SELECT count(*) FROM lineitem
                JOIN orders ON l_orderkey = o_orderkey)::BIGINT
                 AS predicted_rows,
               max(cl * cr)::BIGINT AS max_key_rows
        FROM j""")),

    // ----- q145: cleaning-pipeline audit (Dedup.dedupCorpusAudit) —
    // the per-stage lineage report for the q38 composition: rows in/out
    // and dropped at input → quality gate → exact dedup → near-dup.
    // The oracle replays every stage population (q38's CTE chain) and
    // counts them, so the report is value-verified end to end.
    Q("q145_pipeline_audit",
      (s, d) =>
        graft.operators.Dedup.dedupCorpusAudit(documents(s, d),
          minQuality = 0.3, numHashes = 16, bands = 4, portable = true)
          .orderBy("stage_id"),
      benchRun = Some((s, d) =>
        graft.operators.Dedup.dedupCorpusAudit(documents(s, d),
          minQuality = 0.3, numHashes = 16, bands = 4, portable = false)
          .orderBy("stage_id")),
      oracle = Some(s"""
        WITH RECURSIVE qgate AS (
          SELECT doc_id, text FROM documents
          WHERE round(
                  (length(regexp_extract_all(lower(text), '[a-z]'))
                     / greatest(length(text), 1))
                  * (CASE WHEN length(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), xw -> xw <> ''))
                            BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.5 END)
                  - (length(regexp_extract_all(text, '[0-9]'))
                     / greatest(length(text), 1)), 3) >= 0.3
        ),
        fpk AS (
          SELECT min(doc_id) AS doc_id
          FROM (SELECT doc_id,
                       md5(trim(regexp_replace(regexp_replace(lower(text),
                         '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS fp
                FROM qgate)
          GROUP BY fp
        ),
        s1 AS (SELECT q.* FROM qgate q JOIN fpk USING (doc_id)),
        ${TextQueries.minhashCtesFrom("s1")},
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
          WHERE a.doc_id < b.doc_id),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b, id_a FROM pairs),
        r(id, root) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.dst, r.root FROM r JOIN edges e ON e.src = r.id),
        drops AS (
          SELECT id FROM (SELECT id, min(root) AS comp FROM r GROUP BY id)
          WHERE id <> comp),
        counts AS (
          SELECT 0 AS stage_id, 'input' AS stage,
                 (SELECT count(*) FROM documents) AS rows_out
          UNION ALL
          SELECT 1, 'quality_gate', (SELECT count(*) FROM qgate)
          UNION ALL
          SELECT 2, 'exact_dedup', (SELECT count(*) FROM fpk)
          UNION ALL
          SELECT 3, 'near_dup',
                 (SELECT count(*) FROM s1
                  WHERE doc_id NOT IN (SELECT id FROM drops)))
        SELECT stage_id, stage,
               coalesce(lag(rows_out) OVER (ORDER BY stage_id), rows_out)
                 ::BIGINT AS rows_in,
               rows_out::BIGINT AS rows_out,
               (coalesce(lag(rows_out) OVER (ORDER BY stage_id), rows_out)
                 - rows_out)::BIGINT AS dropped
        FROM counts
        ORDER BY stage_id""")),

    // ----- q146: exact phrase search (TextSearch.phraseSearch) — the
    // positional complement to q57's bag-of-words BM25: "says exactly
    // this", via per-term posting lists lined up at consecutive
    // positions (join input = the phrase terms' postings, never the
    // corpus).
    Q("q146_phrase_search",
      (s, d) =>
        graft.operators.TextSearch.phraseSearch(documents(s, d),
          Seq("table", "hash")).orderBy("doc_id"),
      Some("""
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS a
          FROM documents),
        p AS (
          SELECT doc_id, unnest(a) AS token,
                 unnest(generate_series(1, len(a))) AS pos
          FROM t),
        p2 AS (SELECT * FROM p WHERE token != ''),
        f AS (SELECT doc_id, pos FROM p2 WHERE token = 'table'),
        n AS (SELECT doc_id, pos - 1 AS pos FROM p2 WHERE token = 'hash')
        SELECT doc_id, count(*)::BIGINT AS n_matches
        FROM f JOIN n USING (doc_id, pos)
        GROUP BY doc_id
        ORDER BY doc_id""")),

    // ----- q147: frequent event trigrams (TimeSeries.eventTrigrams) —
    // first-rung sequential-pattern mining: recurring (a → b → c)
    // behavior paths across users; two leads per user, one combinable
    // count, tail cut at minCount.
    Q("q147_event_trigrams",
      (s, d) =>
        TimeSeries.eventTrigrams(events(s, d), minCount = 2)
          .orderBy("e1", "e2", "e3"),
      Some("""
        WITH s AS (
          SELECT event_type AS e1,
                 lead(event_type, 1) OVER w AS e2,
                 lead(event_type, 2) OVER w AS e3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT e1, e2, e3, count(*)::BIGINT AS n
        FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        GROUP BY 1, 2, 3 HAVING count(*) >= 2
        ORDER BY e1, e2, e3""")),

    // ----- q148: RFM user-value segmentation (TimeSeries.rfmScores) —
    // recency/frequency/monetary quintile scores via BROADCAST exact
    // percentile thresholds (score = 1 + thresholds exceeded), never a
    // global ntile over the user table; recency anchored to the corpus
    // max ts so the report is reproducible.
    Q("q148_rfm",
      (s, d) => TimeSeries.rfmScores(events(s, d)).orderBy("user_id"),
      Some("""
        WITH pu AS (
          SELECT user_id, max(epoch_us(ts)) AS last_us,
                 count(*) AS frequency,
                 coalesce(sum(CASE WHEN event_type = 'purchase'
                                   THEN value END), 0) AS monetary
          FROM events GROUP BY 1),
        mx AS (SELECT max(epoch_us(ts)) AS max_us FROM events),
        base AS (
          SELECT user_id,
                 floor((max_us - last_us) / 86400000000)::BIGINT
                   AS recency_days,
                 frequency, monetary
          FROM pu, mx),
        t AS (
          SELECT quantile_cont(recency_days, 0.2) AS r1,
                 quantile_cont(recency_days, 0.4) AS r2,
                 quantile_cont(recency_days, 0.6) AS r3,
                 quantile_cont(recency_days, 0.8) AS r4,
                 quantile_cont(frequency, 0.2) AS f1,
                 quantile_cont(frequency, 0.4) AS f2,
                 quantile_cont(frequency, 0.6) AS f3,
                 quantile_cont(frequency, 0.8) AS f4,
                 quantile_cont(monetary, 0.2) AS m1,
                 quantile_cont(monetary, 0.4) AS m2,
                 quantile_cont(monetary, 0.6) AS m3,
                 quantile_cont(monetary, 0.8) AS m4
          FROM base),
        scored AS (
          SELECT user_id, recency_days, frequency,
                 round(monetary, 2) AS monetary,
                 6 - (1 + (recency_days > r1)::INT + (recency_days > r2)::INT
                        + (recency_days > r3)::INT + (recency_days > r4)::INT)
                   AS r_score,
                 1 + (frequency > f1)::INT + (frequency > f2)::INT
                   + (frequency > f3)::INT + (frequency > f4)::INT
                   AS f_score,
                 1 + (monetary > m1)::INT + (monetary > m2)::INT
                   + (monetary > m3)::INT + (monetary > m4)::INT
                   AS m_score
          FROM base, t)
        SELECT user_id, recency_days, frequency, monetary,
               r_score, f_score, m_score,
               r_score::VARCHAR || f_score::VARCHAR || m_score::VARCHAR
                 AS rfm
        FROM scored
        ORDER BY user_id""")),

    // ----- q149: modal imputation (Warehouse.imputeMode) — categorical
    // data repair: NULL langs (synthesized at doc_id % 7 = 0) filled
    // with the source's most frequent non-null lang, min-lang tie-break;
    // imputed rows flagged, groups with no signal keep their NULL.
    Q("q149_impute_mode",
      (s, d) =>
        Warehouse.imputeMode(
            documents(s, d).select(col("doc_id"), col("source"),
              when(col("doc_id") % 7 === 0, lit(null: String))
                .otherwise(col("lang")).as("lang")),
            "source", "lang")
          .select("doc_id", "source", "lang", "was_imputed")
          .orderBy("doc_id"),
      Some("""
        WITH nulled AS (
          SELECT doc_id, source,
                 CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang
          FROM documents),
        cnt AS (
          SELECT source, lang, count(*) AS c
          FROM nulled WHERE lang IS NOT NULL GROUP BY 1, 2),
        modes AS (
          SELECT source, lang AS mode_lang FROM (
            SELECT source, lang,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY c DESC, lang) AS rn
            FROM cnt) WHERE rn = 1)
        SELECT n.doc_id, n.source,
               coalesce(n.lang, m.mode_lang) AS lang,
               n.lang IS NULL AND m.mode_lang IS NOT NULL AS was_imputed
        FROM nulled n LEFT JOIN modes m
          ON n.source IS NOT DISTINCT FROM m.source
        ORDER BY n.doc_id""")),

    // ----- q150: top recurring session paths (TimeSeries.sessionPaths)
    // — q19's gap-cut sessions rendered as ordered event-type strings
    // and counted across sessions; the discovered-behavior complement to
    // q94's predefined funnel.
    Q("q150_session_paths",
      (s, d) =>
        TimeSeries.sessionPaths(events(s, d)).orderBy("path"),
      Some("""
        WITH g AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1) OVER w
                        > 1800000000
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
          SELECT *, sum(new_s) OVER (PARTITION BY user_id
                   ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)
                 AS sess_id
          FROM g),
        paths AS (
          SELECT user_id, sess_id,
                 string_agg(event_type, '>' ORDER BY us, event_id)
                   AS path
          FROM sess GROUP BY 1, 2)
        SELECT path, count(*)::BIGINT AS n_sessions
        FROM paths GROUP BY 1 HAVING count(*) >= 2
        ORDER BY path""")),

    // ----- q151: ER survivorship / golden records (Dedup.goldenRecords)
    // — each near-dup component collapsed to one merged record (min id
    // canonical, union langs/sources, max length); components replayed
    // in DuckDB exactly as q37/q135 do.
    Q("q151_golden_record",
      (s, d) => {
        val docs = documents(s, d)
        val comps = graft.operators.Dedup.nearDupComponents(
          graft.operators.Dedup.lshCandidatePairs(docs, numHashes = 16,
            bands = 4, portable = true))
        graft.operators.Dedup.goldenRecords(docs, comps)
          .orderBy("group_id")
      },
      Some(s"""
        WITH RECURSIVE ${TextQueries.minhashCtes},
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
          WHERE a.doc_id < b.doc_id),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b, id_a FROM pairs),
        r(id, root) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.dst, r.root FROM r JOIN edges e ON e.src = r.id),
        comp AS (SELECT id, min(root) AS component FROM r GROUP BY id),
        g AS (
          SELECT d.doc_id, d.lang, d.source, d.n_chars,
                 coalesce(c.component, d.doc_id) AS group_id
          FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
        SELECT group_id, min(doc_id)::BIGINT AS canonical_id,
               count(*)::BIGINT AS n_members,
               array_to_string(list_sort(list(DISTINCT lang)), ',')
                 AS langs,
               array_to_string(list_sort(list(DISTINCT source)), ',')
                 AS sources,
               max(n_chars)::BIGINT AS max_chars
        FROM g GROUP BY 1
        ORDER BY group_id""")),

    // ----- q152: personalized PageRank (WebGraph.personalizedPageRank)
    // — random walk with restart onto the {src1, src4} seed set: topical
    // authority relative to trusted hosts, 5 unrolled iterations.
    Q("q152_personalized_pagerank",
      (s, d) => {
        import s.implicits._
        val seeds = Seq("src1", "src4").toDF("node")
        WebGraph.personalizedPageRank(hostEdges(s, d), seeds, iters = 5)
          .orderBy("node")
      },
      Some(pprOracle(5))),

    // ----- q153: language-ID confusion matrix (Evaluation
    // .confusionMatrix) — per-(actual, predicted) counts + row recall
    // for the q31 language gate; DuckDB replays the classifier itself
    // (q31's scoring CTE) and the matrix.
    Q("q153_langid_confusion",
      (s, d) =>
        graft.operators.Evaluation.confusionMatrix(
            documents(s, d).select(col("lang"),
              TextAnalysis.langId(col("text")).getField("lang")
                .as("pred")),
            "lang", "pred")
          .orderBy("actual", "predicted"),
      Some(s"""
        WITH $langIdPredsCtes,
        cm AS (
          SELECT lang AS actual, pred AS predicted, count(*) AS n
          FROM preds GROUP BY 1, 2),
        rt AS (SELECT actual, sum(n) AS rn FROM cm GROUP BY 1)
        SELECT cm.actual, cm.predicted, cm.n::BIGINT AS n,
               round(cm.n / rt.rn, 4) AS row_frac
        FROM cm JOIN rt USING (actual)
        ORDER BY actual, predicted""")),

    // ----- q154: Cohen's kappa of the language gate (Evaluation
    // .cohenKappa) — agreement beyond chance, the one-number health
    // check accuracy overstates under class skew.
    Q("q154_langid_kappa",
      (s, d) =>
        graft.operators.Evaluation.cohenKappa(
          documents(s, d).select(col("lang"),
            TextAnalysis.langId(col("text")).getField("lang").as("pred")),
          "lang", "pred"),
      Some(s"""
        WITH $langIdPredsCtes,
        cm AS (SELECT lang AS a, pred AS p, count(*) AS n
               FROM preds GROUP BY 1, 2),
        tot AS (SELECT sum(n)::DOUBLE AS nn FROM cm),
        po AS (
          SELECT coalesce(sum(CASE WHEN a = p THEN n END), 0)::DOUBLE
                   AS agree
          FROM cm),
        rows_ AS (SELECT a, sum(n) AS rn FROM cm GROUP BY 1),
        cols_ AS (SELECT p, sum(n) AS cn FROM cm GROUP BY 1),
        pe AS (
          SELECT coalesce(sum(rn * cn), 0)::DOUBLE AS rc
          FROM rows_ JOIN cols_ ON a = p)
        SELECT nn::BIGINT AS n,
               round(agree / nn, 4) AS po,
               round(rc / (nn * nn), 4) AS pe,
               round(CASE WHEN rc / (nn * nn) < 1.0
                 THEN (agree / nn - rc / (nn * nn))
                      / (1.0 - rc / (nn * nn)) END, 4) AS kappa
        FROM tot, po, pe""")),

    // ----- q155: per-class precision/recall/F1 (Evaluation.perClassPrf)
    // — the per-language report card behind q154's single kappa; NULL
    // where a denominator is empty instead of fake zeros.
    Q("q155_langid_prf",
      (s, d) =>
        graft.operators.Evaluation.perClassPrf(
            documents(s, d).select(col("lang"),
              TextAnalysis.langId(col("text")).getField("lang")
                .as("pred")),
            "lang", "pred")
          .orderBy("label"),
      Some(s"""
        WITH $langIdPredsCtes,
        cm AS (SELECT lang AS a, pred AS p, count(*) AS n
               FROM preds GROUP BY 1, 2),
        labels AS (
          SELECT DISTINCT a AS label FROM cm
          UNION SELECT DISTINCT p FROM cm),
        diag AS (SELECT a AS label, n AS tp FROM cm WHERE a = p),
        rows_ AS (SELECT a AS label, sum(n) AS support FROM cm GROUP BY 1),
        cols_ AS (SELECT p AS label, sum(n) AS predn FROM cm GROUP BY 1),
        j AS (
          SELECT l.label, coalesce(support, 0) AS support,
                 coalesce(tp, 0)::DOUBLE
                   / (CASE WHEN predn > 0 THEN predn END) AS pr,
                 coalesce(tp, 0)::DOUBLE
                   / (CASE WHEN support > 0 THEN support END) AS rc
          FROM labels l
          LEFT JOIN diag USING (label)
          LEFT JOIN rows_ USING (label)
          LEFT JOIN cols_ USING (label))
        SELECT label, support::BIGINT AS support,
               round(pr, 4) AS "precision", round(rc, 4) AS recall,
               round(CASE WHEN pr + rc > 0
                          THEN 2 * pr * rc / (pr + rc) END, 4) AS f1
        FROM j
        ORDER BY label""")),

    // ----- q156: bucketed ROC-AUC (Evaluation.bucketedAuc) — does the
    // quality score separate near-duplicate members (LSH pair docs)
    // from unique docs? 20 equal-width score buckets → cumulative
    // TPR/FPR → trapezoid; the monitoring-grade AUC with no global rank
    // anywhere.
    Q("q156_quality_dup_auc",
      (s, d) => {
        val docs = fanOut(documents(s, d))
        val pairs = graft.operators.Dedup.lshCandidatePairs(docs,
          numHashes = 16, bands = 4, portable = true)
        val members = pairs.select(col("id_a").as("doc_id"))
          .unionByName(pairs.select(col("id_b").as("doc_id")))
          .distinct().withColumn("__m", lit(1))
        val scored = docs.select(col("doc_id"),
            round(TextAnalysis.qualityScore(col("text")), 3).as("q"))
          .join(members, Seq("doc_id"), "left")
          .select(col("doc_id"), col("q"),
            col("__m").isNotNull.as("is_dup"))
        graft.operators.Evaluation.bucketedAuc(scored, "q", "is_dup")
      },
      Some(s"""
        WITH ${TextQueries.minhashCtes},
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
          WHERE a.doc_id < b.doc_id),
        members AS (
          SELECT DISTINCT id FROM (
            SELECT id_a AS id FROM pairs
            UNION ALL SELECT id_b FROM pairs)),
        lab AS (
          SELECT d.doc_id, m.id IS NOT NULL AS y
          FROM documents d LEFT JOIN members m ON m.id = d.doc_id),
        q AS (
          SELECT doc_id, round(
                  (length(regexp_extract_all(lower(text), '[a-z]'))
                     / greatest(length(text), 1))
                  * (CASE WHEN length(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), xw -> xw <> ''))
                            BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.5 END)
                  - (length(regexp_extract_all(text, '[0-9]'))
                     / greatest(length(text), 1)), 3) AS s
          FROM documents),
        b AS (SELECT min(s)::DOUBLE AS mn, max(s)::DOUBLE AS mx FROM q),
        cells AS (
          SELECT CASE WHEN mx - mn <= 0 THEN 0
                      ELSE least(floor((s - mn) / (mx - mn) * 20)::BIGINT,
                                 19) END AS bucket,
                 sum(CASE WHEN y THEN 1 ELSE 0 END) AS pos,
                 sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS neg
          FROM q JOIN lab USING (doc_id), b
          GROUP BY 1),
        tot AS (
          SELECT sum(pos)::DOUBLE AS tp, sum(neg)::DOUBLE AS tn
          FROM cells),
        c1 AS (
          SELECT bucket, sum(pos) OVER w AS cp, sum(neg) OVER w AS cn_,
                 tp, tn
          FROM cells, tot
          WINDOW w AS (ORDER BY bucket DESC ROWS UNBOUNDED PRECEDING)),
        c2 AS (
          SELECT bucket, cp / tp AS ctpr, cn_ / tn AS cfpr,
                 coalesce(lag(cp / tp) OVER (ORDER BY bucket DESC), 0)
                   AS ptpr,
                 coalesce(lag(cn_ / tn) OVER (ORDER BY bucket DESC), 0)
                   AS pfpr,
                 tp, tn
          FROM c1)
        SELECT max(tp)::BIGINT AS n_pos, max(tn)::BIGINT AS n_neg,
               round(CASE WHEN max(tp) > 0 AND max(tn) > 0
                 THEN sum((cfpr - pfpr) * (ctpr + ptpr) / 2) END, 4)
                 AS auc
        FROM c2""")),

    // ----- q157: group-aware k-fold assignment (Dedup.groupAwareFolds)
    // — q135's leakage guard, k ways: fold = md5(component id) mod 5,
    // so cross-validation folds never split a mirror pair.
    Q("q157_groupaware_folds",
      (s, d) => {
        val docs = documents(s, d)
        val comps = graft.operators.Dedup.nearDupComponents(
          graft.operators.Dedup.lshCandidatePairs(docs, numHashes = 16,
            bands = 4, portable = true))
        graft.operators.Dedup.groupAwareFolds(docs, comps, k = 5)
          .orderBy("doc_id")
      },
      Some(s"""
        WITH RECURSIVE ${TextQueries.minhashCtes},
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
          WHERE a.doc_id < b.doc_id),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b, id_a FROM pairs),
        r(id, root) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.dst, r.root FROM r JOIN edges e ON e.src = r.id),
        comp AS (SELECT id, min(root) AS component FROM r GROUP BY id)
        SELECT d.doc_id,
               coalesce(c.component, d.doc_id) AS group_id,
               CAST(('0x' || substr(md5(
                   coalesce(c.component, d.doc_id)::VARCHAR), 1, 4))
                 AS INT) % 5 AS fold
        FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
        ORDER BY d.doc_id""")),

    // ----- q158: score lift table (Evaluation.liftTable) — the
    // calibration view behind q156's AUC: per score bucket, positive
    // rate and lift over base rate for the same near-dup label.
    Q("q158_score_lift",
      (s, d) => {
        val docs = fanOut(documents(s, d))
        val pairs = graft.operators.Dedup.lshCandidatePairs(docs,
          numHashes = 16, bands = 4, portable = true)
        val members = pairs.select(col("id_a").as("doc_id"))
          .unionByName(pairs.select(col("id_b").as("doc_id")))
          .distinct().withColumn("__m", lit(1))
        val scored = docs.select(col("doc_id"),
            round(TextAnalysis.qualityScore(col("text")), 3).as("q"))
          .join(members, Seq("doc_id"), "left")
          .select(col("q"), col("__m").isNotNull.as("is_dup"))
        graft.operators.Evaluation.liftTable(scored, "q", "is_dup",
          nBuckets = 10).orderBy("bucket")
      },
      Some(s"""
        WITH ${TextQueries.minhashCtes},
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
          WHERE a.doc_id < b.doc_id),
        members AS (
          SELECT DISTINCT id FROM (
            SELECT id_a AS id FROM pairs
            UNION ALL SELECT id_b FROM pairs)),
        lab AS (
          SELECT d.doc_id, m.id IS NOT NULL AS y
          FROM documents d LEFT JOIN members m ON m.id = d.doc_id),
        q AS (
          SELECT doc_id, round(
                  (length(regexp_extract_all(lower(text), '[a-z]'))
                     / greatest(length(text), 1))
                  * (CASE WHEN length(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), xw -> xw <> ''))
                            BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.5 END)
                  - (length(regexp_extract_all(text, '[0-9]'))
                     / greatest(length(text), 1)), 3) AS s
          FROM documents),
        b AS (SELECT min(s)::DOUBLE AS mn, max(s)::DOUBLE AS mx FROM q),
        cells AS (
          SELECT CASE WHEN mx - mn <= 0 THEN 0
                      ELSE least(floor((s - mn) / (mx - mn) * 10)::BIGINT,
                                 9) END AS bucket,
                 count(*) AS n,
                 sum(CASE WHEN y THEN 1 ELSE 0 END) AS n_pos
          FROM q JOIN lab USING (doc_id), b
          GROUP BY 1),
        base AS (
          SELECT sum(n_pos)::DOUBLE / sum(n) AS br FROM cells)
        SELECT bucket, n::BIGINT AS n, n_pos::BIGINT AS n_pos,
               round(n_pos / n, 4) AS pos_rate,
               round(n_pos / n / (CASE WHEN br > 0 THEN br END), 4)
                 AS lift
        FROM cells, base
        ORDER BY bucket""")),

    // ----- q159: recency-decay training weights (TimeSeries
    // .decayWeights) — exp(−age_days/30) freshness weighting anchored
    // to the corpus max date, rolled up per order priority so the
    // weighted-vs-raw revenue contrast is visible in five rows.
    Q("q159_decay_weights",
      (s, d) =>
        TimeSeries.decayWeights(orders(s, d), "o_orderdate",
            tauDays = 30.0)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            round(sum("o_totalprice"), 2).as("revenue"),
            round(sum(col("o_totalprice") * col("decay_weight")), 2)
              .as("weighted_revenue"))
          .orderBy("o_orderpriority"),
      Some("""
        WITH mx AS (SELECT max(epoch_us(o_orderdate)) AS m FROM orders),
        w AS (
          SELECT o_orderpriority, o_totalprice,
                 round(exp(-(floor((m - epoch_us(o_orderdate))
                     / 86400000000.0))::BIGINT / 30.0), 6) AS dw
          FROM orders, mx)
        SELECT o_orderpriority, count(*)::BIGINT AS n,
               round(sum(o_totalprice), 2) AS revenue,
               round(sum(o_totalprice * dw), 2) AS weighted_revenue
        FROM w GROUP BY 1
        ORDER BY o_orderpriority""")),

    // ----- q160: population stability index (Layout.psiScore) — the
    // bucketed industry drift metric next to q97's categorical KL:
    // first-half docs are the reference frame, second-half the current
    // sample; buckets cut from REFERENCE bounds, smoothed shares.
    Q("q160_psi_drift",
      (s, d) => {
        val q = documents(s, d).select(col("doc_id"),
          round(TextAnalysis.qualityScore(col("text")), 3).as("score"))
        graft.operators.Layout.psiScore(
          q.filter(col("doc_id") >= 250), q.filter(col("doc_id") < 250),
          "score")
      },
      Some("""
        WITH scored AS (
          SELECT doc_id, round(
                  (length(regexp_extract_all(lower(text), '[a-z]'))
                     / greatest(length(text), 1))
                  * (CASE WHEN length(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), xw -> xw <> ''))
                            BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.5 END)
                  - (length(regexp_extract_all(text, '[0-9]'))
                     / greatest(length(text), 1)), 3) AS s
          FROM documents),
        ref AS (SELECT s FROM scored WHERE doc_id < 250),
        cur AS (SELECT s FROM scored WHERE doc_id >= 250),
        b AS (SELECT min(s)::DOUBLE AS mn, max(s)::DOUBLE AS mx FROM ref),
        cc AS (
          SELECT greatest(CASE WHEN mx - mn <= 0 THEN 0
                   ELSE least(floor((s - mn) / (mx - mn) * 10)::BIGINT, 9)
                 END, 0) AS bucket, count(*) AS nc
          FROM cur, b GROUP BY 1),
        cr AS (
          SELECT greatest(CASE WHEN mx - mn <= 0 THEN 0
                   ELSE least(floor((s - mn) / (mx - mn) * 10)::BIGINT, 9)
                 END, 0) AS bucket, count(*) AS nr
          FROM ref, b GROUP BY 1),
        j AS (
          SELECT coalesce(cc.bucket, cr.bucket) AS bucket,
                 coalesce(nc, 0) AS nc, coalesce(nr, 0) AS nr
          FROM cc FULL JOIN cr ON cc.bucket = cr.bucket),
        t AS (SELECT sum(nc)::DOUBLE AS tc, sum(nr)::DOUBLE AS tr FROM j)
        SELECT max(tc)::BIGINT AS n_cur, max(tr)::BIGINT AS n_ref,
               round(sum(
                 (((nc + 0.5) / (tc + 5)) - ((nr + 0.5) / (tr + 5)))
                 * ln(((nc + 0.5) / (tc + 5))
                      / ((nr + 0.5) / (tr + 5)))), 6) AS psi
        FROM j, t""")),

    // ----- q161: source-concentration Gini (Layout.giniConcentration)
    // — corpus diversity in one number via the exact sorted-share
    // formula over the per-source count table.
    Q("q161_source_gini",
      (s, d) =>
        graft.operators.Layout.giniConcentration(documents(s, d),
          "source"),
      Some("""
        WITH c AS (
          SELECT source, count(*) AS c FROM documents GROUP BY 1),
        r AS (
          SELECT c, row_number() OVER (ORDER BY c, source) AS i FROM c),
        t AS (SELECT sum(c) AS t, count(*) AS k FROM r)
        SELECT max(k)::BIGINT AS n_groups, max(t)::BIGINT AS n_rows,
               round(sum((2 * i - k - 1) * c) / (max(k) * max(t)), 6)
                 AS gini
        FROM r, t""")),

    // ----- q162: inter-event burstiness (TimeSeries.burstiness) — the
    // rhythm fingerprint: per-user CV of inter-arrival gaps (scripted
    // clients ≈ 0, organic ≥ 1); one lag per user + moment aggregates.
    Q("q162_burstiness",
      (s, d) =>
        TimeSeries.burstiness(events(s, d)).orderBy("user_id"),
      Some("""
        WITH g AS (
          SELECT user_id,
                 (epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id))
                   / 1000000.0 AS gap_s
          FROM events),
        a AS (
          SELECT user_id, count(*) AS n_gaps, avg(gap_s) AS m,
                 stddev_samp(gap_s) AS sd
          FROM g WHERE gap_s IS NOT NULL GROUP BY 1)
        SELECT user_id, n_gaps::BIGINT AS n_gaps,
               round(m, 2) AS mean_gap_s, round(sd, 2) AS sd_gap_s,
               round(sd / (CASE WHEN m > 0 THEN m END), 4) AS cv
        FROM a WHERE n_gaps >= 4
        ORDER BY user_id""")),

    // ----- q163: Flesch-style readability (TextAnalysis.readability) —
    // vowel-group syllable proxy + words/sentences, the classic
    // reading-ease formula as one shuffle-free scalar pass.
    Q("q163_readability",
      (s, d) =>
        TextAnalysis.readability(documents(s, d)).orderBy("doc_id"),
      Some("""
        WITH c AS (
          SELECT doc_id,
                 len(list_filter(
                   regexp_split_to_array(trim(lower(text)), '\s+'),
                   xw -> xw <> ''))::BIGINT AS n_words,
                 greatest(len(list_filter(
                   regexp_split_to_array(text, '[.!?]+'),
                   x -> length(trim(x)) > 0)), 1)::BIGINT AS n_sentences,
                 length(regexp_extract_all(lower(text), '[aeiouy]+'))
                   ::BIGINT AS n_syllables
          FROM documents)
        -- flesch is UNROUNDED on both sides: the same left-associated
        -- IEEE expression yields bit-identical doubles on both engines,
        -- whereas round(x, 2) diverges at the exact half-values the
        -- formula's 3-decimal constants produce (85.165, 9.205, ...)
        SELECT doc_id, n_words, n_sentences, n_syllables,
               CASE WHEN n_words > 0
                 THEN 206.835
                      - 1.015 * (n_words / n_sentences::DOUBLE)
                      - 84.6 * (n_syllables / n_words::DOUBLE) END
                 AS flesch
        FROM c
        ORDER BY doc_id""")),

    // ----- q164: Benford first-digit conformance (Warehouse
    // .benfordDigits) — the forgery/garbage test for numeric columns:
    // observed vs log10(1+1/d) shares + χ² terms over order prices.
    Q("q164_benford",
      (s, d) =>
        Warehouse.benfordDigits(orders(s, d), "o_totalprice")
          .orderBy("digit"),
      Some("""
        WITH fd AS (
          SELECT try_cast(regexp_extract(abs(o_totalprice)::VARCHAR,
                   '[1-9]', 0) AS INT) AS digit
          FROM orders WHERE abs(o_totalprice) >= 1e-10),
        obs AS (
          SELECT digit, count(*) AS n FROM fd
          WHERE digit BETWEEN 1 AND 9 GROUP BY 1),
        -- all 9 digits always (the engine's spine): an absent digit's
        -- zero row carries the dominant chi-square term
        c AS (
          SELECT s.digit::INT AS digit, coalesce(obs.n, 0) AS n
          FROM (SELECT unnest(range(1, 10)) AS digit) s
          LEFT JOIN obs USING (digit)),
        t AS (SELECT sum(n)::DOUBLE AS tt FROM c)
        SELECT digit, n::BIGINT AS n,
               round(n / tt, 4) AS p_obs,
               round(log10(1.0 + 1.0 / digit), 4) AS p_exp,
               round(tt * pow(n / tt - log10(1.0 + 1.0 / digit), 2)
                     / log10(1.0 + 1.0 / digit), 4) AS chi2_term
        FROM c, t
        ORDER BY digit""")),

    // ----- q165: duplicate-cluster size distribution (component sizes
    // → counts per size) — the dedup-health report: a fat tail of huge
    // components means over-merging (bad bands), all-size-2 means the
    // threshold is conservative.
    Q("q165_dup_cluster_sizes",
      (s, d) => {
        val comps = graft.operators.Dedup.nearDupComponents(
          graft.operators.Dedup.lshCandidatePairs(documents(s, d),
            numHashes = 16, bands = 4, portable = true))
        comps.groupBy("component").agg(count(lit(1)).as("size"))
          .groupBy("size").agg(count(lit(1)).as("n_clusters"))
          .orderBy("size")
      },
      Some(s"""
        WITH RECURSIVE ${TextQueries.minhashCtes},
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
          WHERE a.doc_id < b.doc_id),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b, id_a FROM pairs),
        r(id, root) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.dst, r.root FROM r JOIN edges e ON e.src = r.id),
        comp AS (SELECT id, min(root) AS component FROM r GROUP BY id),
        sizes AS (
          SELECT component, count(*) AS size FROM comp GROUP BY 1)
        SELECT size::BIGINT AS size, count(*)::BIGINT AS n_clusters
        FROM sizes GROUP BY 1
        ORDER BY size""")),

    // ----- q166: the dataset card (one row) — the release-notes summary
    // a corpus ships with, composed from already-verified pieces: sizes,
    // diversity counts, token volume, mean quality, exact-dup rate.
    Q("q166_dataset_card",
      (s, d) => {
        val docs = documents(s, d)
        docs.select(col("doc_id"), col("lang"), col("source"),
            size(array_remove(split(trim(col("text")), "\\s+"), "")).cast("long")
              .as("toks"),
            TextAnalysis.qualityScore(col("text")).as("q"),
            TextAnalysis.fingerprint(col("text")).as("fp"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct("source").as("n_sources"),
            countDistinct("lang").as("n_langs"),
            sum("toks").as("total_tokens"),
            round(avg("q"), 4).as("avg_quality"),
            round(lit(1.0) -
              countDistinct("fp") / count(lit(1)).cast("double"), 4)
              .as("exact_dup_rate"))
      },
      Some("""
        SELECT count(*)::BIGINT AS n_docs,
               count(DISTINCT source)::BIGINT AS n_sources,
               count(DISTINCT lang)::BIGINT AS n_langs,
               sum(len(list_filter(regexp_split_to_array(trim(text), '\s+'), xw -> xw <> '')))::BIGINT
                 AS total_tokens,
               round(avg(
                  (length(regexp_extract_all(lower(text), '[a-z]'))
                     / greatest(length(text), 1))
                  * (CASE WHEN length(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), xw -> xw <> ''))
                            BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.5 END)
                  - (length(regexp_extract_all(text, '[0-9]'))
                     / greatest(length(text), 1))), 4) AS avg_quality,
               round(1.0 - count(DISTINCT md5(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
                   '\s+', ' ', 'g')))) / count(*)::DOUBLE, 4)
                 AS exact_dup_rate
        FROM documents""")),

    // ----- q167: search-result snippets (TextSearch.snippets) — the
    // ±30-char window around the first 'merge' occurrence for the docs
    // that contain it; the UX step after BM25 ranks.
    Q("q167_snippets",
      (s, d) =>
        graft.operators.TextSearch.snippets(documents(s, d), "merge")
          .orderBy("doc_id"),
      Some("""
        SELECT doc_id, strpos(lower(text), 'merge') AS pos,
               substr(text, greatest(strpos(lower(text), 'merge') - 30, 1),
                 65) AS snippet
        FROM documents
        WHERE strpos(lower(text), 'merge') > 0
        ORDER BY doc_id""")),

    // ----- q168: LSH banding S-curve tuning table (Dedup
    // .lshTuningTable) — candidate probability 1−(1−s^r)^b over a
    // similarity grid for every 16-hash (b, r) split, plus each config's
    // threshold estimate: the recall/cost dial for the whole q35 family,
    // emitted as a relation.
    Q("q168_lsh_tuning",
      (s, _) => graft.operators.Dedup.lshTuningTable(s)
        .orderBy("bands", "s"),
      Some("""
        WITH cfg(bands, rows_per_band) AS (
          VALUES (16, 1), (8, 2), (4, 4), (2, 8), (1, 16)),
        grid AS (SELECT g / 20.0 AS s FROM generate_series(1, 19) t(g))
        SELECT bands, rows_per_band, round(s, 2) AS s,
               round(pow(1.0 / bands, 1.0 / rows_per_band), 4)
                 AS s_threshold,
               round(1.0 - pow(1.0 - pow(s, rows_per_band), bands), 4)
                 AS p_candidate
        FROM cfg, grid
        ORDER BY bands, s""")),

    // ----- q169: reciprocal-rank fusion (TextSearch.rrfFuse) — merge a
    // raw-tf ranking and a length-normalized-density ranking of the
    // 'merge' hits without score calibration; 1/(60+rank) contributions.
    Q("q169_rank_fusion",
      (s, d) => {
        val tf = documents(s, d).select(col("doc_id"),
            size(regexp_extract_all(lower(col("text")), lit("merge"),
              lit(0))).cast("long").as("tf"), col("n_chars"))
          .filter(col("tf") > 0)
        val r1 = tf.select(col("doc_id"),
          col("tf").cast("double").as("score"))
        val r2 = tf.select(col("doc_id"),
          (col("tf") / col("n_chars")).as("score"))
        graft.operators.TextSearch.rrfFuse(Seq(r1, r2))
          .orderBy(desc("rrf"), col("doc_id"))
      },
      Some("""
        WITH tf AS (
          SELECT doc_id,
                 length(regexp_extract_all(lower(text), 'merge')) AS tf,
                 n_chars
          FROM documents),
        hit AS (SELECT * FROM tf WHERE tf > 0),
        r1 AS (
          SELECT doc_id, row_number() OVER (ORDER BY tf DESC, doc_id)
                   AS rnk
          FROM hit),
        r2 AS (
          SELECT doc_id, row_number() OVER
                   (ORDER BY tf::DOUBLE / n_chars DESC, doc_id) AS rnk
          FROM hit),
        u AS (
          SELECT doc_id, 1.0 / (60 + rnk) AS c FROM r1
          UNION ALL
          SELECT doc_id, 1.0 / (60 + rnk) FROM r2)
        SELECT doc_id, round(sum(c), 6) AS rrf,
               count(*)::BIGINT AS n_lists
        FROM u GROUP BY 1
        ORDER BY rrf DESC, doc_id""")),

    // ----- q170: empirical Jaccard threshold sweep (Dedup
    // .thresholdSweep over q61's verified pairs) — pairs kept per 0.1
    // band plus the descending cumulative: the DATA behind choosing the
    // verification gate, next to q168's theory curve.
    Q("q170_threshold_sweep",
      (s, d) => {
        val docs = fanOut(documents(s, d))
        val cand = graft.operators.Dedup.lshCandidatePairs(docs,
          numHashes = 16, bands = 4, portable = true)
        graft.operators.Dedup.thresholdSweep(
            graft.operators.Dedup.pairJaccard(cand, docs,
              portable = true))
          .orderBy("band_lo")
      },
      Some(s"""
        WITH ${TextQueries.minhashCtes},
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
          WHERE a.doc_id < b.doc_id),
        sizes AS (SELECT doc_id, count(*) AS sz FROM toks2 GROUP BY 1),
        inter AS (
          SELECT p.id_a, p.id_b, count(*) AS inter
          FROM pairs p
          JOIN toks2 ta ON ta.doc_id = p.id_a
          JOIN toks2 tb ON tb.doc_id = p.id_b AND tb.th = ta.th
          GROUP BY 1, 2),
        jac AS (
          SELECT coalesce(i.inter, 0)
                   / (sa.sz + sb.sz - coalesce(i.inter, 0)) AS jaccard
          FROM pairs p
          LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
          JOIN sizes sa ON sa.doc_id = p.id_a
          JOIN sizes sb ON sb.doc_id = p.id_b),
        bandsag AS (
          SELECT floor(jaccard / 0.1) * 0.1 AS band_lo,
                 count(*) AS n_pairs
          FROM jac GROUP BY 1)
        SELECT round(band_lo, 4) AS band_lo, n_pairs::BIGINT AS n_pairs,
               sum(n_pairs) OVER (ORDER BY band_lo DESC
                 ROWS UNBOUNDED PRECEDING)::BIGINT AS n_at_or_above
        FROM bandsag
        ORDER BY band_lo""")),

    // ----- q171: resharding migration cost (Layout.reshardCost) — the
    // before-you-reshard answer: growing 16 → 20 shards, mod-hashing
    // moves ~95% of docs while a consistent ring moves ~20%; both
    // fractions computed exactly over md5 positions.
    Q("q171_reshard_cost",
      (s, d) =>
        graft.operators.Layout.reshardCost(documents(s, d), "doc_id",
          nOld = 16, nNew = 20).orderBy("scheme"),
      Some("""
        WITH pos AS (
          SELECT CAST(('0x' || substring(md5(doc_id::VARCHAR), 1, 15))
                   AS BIGINT) AS h
          FROM documents),
        modrow AS (
          SELECT 'mod' AS scheme, count(*) AS n_docs,
                 sum(CASE WHEN h % 16 != h % 20 THEN 1 ELSE 0 END)
                   AS n_moved
          FROM pos),
        nodes AS (
          SELECT g AS node,
                 CAST(('0x' || substring(md5('node' || g), 1, 15))
                   AS BIGINT) AS point
          FROM generate_series(0, 19) t(g)),
        a16 AS (
          SELECT p.h,
                 coalesce(
                   (SELECT min_by(node, point) FROM nodes n
                    WHERE n.node < 16 AND n.point >= p.h),
                   (SELECT min_by(node, point) FROM nodes n
                    WHERE n.node < 16)) AS a
          FROM pos p),
        a20 AS (
          SELECT p.h,
                 coalesce(
                   (SELECT min_by(node, point) FROM nodes n
                    WHERE n.point >= p.h),
                   (SELECT min_by(node, point) FROM nodes n)) AS a
          FROM pos p),
        ringrow AS (
          SELECT 'ring' AS scheme, count(*) AS n_docs,
                 sum(CASE WHEN a16.a != a20.a THEN 1 ELSE 0 END)
                   AS n_moved
          FROM a16 JOIN a20 USING (h))
        SELECT scheme, n_docs::BIGINT AS n_docs, n_moved::BIGINT
                 AS n_moved,
               round(n_moved / n_docs::DOUBLE, 4) AS frac_moved
        FROM (SELECT * FROM modrow UNION ALL SELECT * FROM ringrow)
        ORDER BY scheme""")),

    // ----- q172: stored-query percolation (TextSearch.percolate) —
    // phrase search reversed: three standing two-term subscriptions
    // matched against every document in one postings pass; the
    // alerting/routing primitive.
    Q("q172_stored_queries",
      (s, d) => {
        import s.implicits._
        val queries = Seq(("q_th", "table", "hash"),
          ("q_mg", "merge", "group"), ("q_sk", "slow", "key"))
          .toDF("query_id", "t1", "t2")
        graft.operators.TextSearch.percolate(documents(s, d), queries)
          .orderBy("query_id", "doc_id")
      },
      Some("""
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS a
          FROM documents),
        p AS (
          SELECT doc_id, unnest(a) AS token,
                 unnest(generate_series(1, len(a))) AS pos
          FROM t),
        p2 AS (SELECT * FROM p WHERE token != ''),
        q(query_id, t1, t2) AS (
          VALUES ('q_th', 'table', 'hash'), ('q_mg', 'merge', 'group'),
                 ('q_sk', 'slow', 'key')),
        f AS (
          SELECT q.query_id, p2.doc_id, p2.pos, q.t2
          FROM p2 JOIN q ON p2.token = q.t1),
        m AS (
          SELECT f.query_id, f.doc_id
          FROM f JOIN p2 s2
            ON s2.doc_id = f.doc_id AND s2.pos = f.pos + 1
           AND s2.token = f.t2)
        SELECT query_id, doc_id, count(*)::BIGINT AS n_matches
        FROM m GROUP BY 1, 2
        ORDER BY query_id, doc_id""")),

    // ----- q173: per-priority trimmed mean of order value (Warehouse
    // .trimmedMean) — the robust location estimate next to the raw mean;
    // the gap between the two IS the outlier signal.
    Q("q173_trimmed_mean",
      (s, d) =>
        Warehouse.trimmedMean(orders(s, d), "o_orderpriority",
          "o_totalprice").orderBy("o_orderpriority"),
      Some("""
        WITH f AS (
          SELECT o_orderpriority AS g,
                 quantile_cont(o_totalprice, 0.1) AS lo,
                 quantile_cont(o_totalprice, 0.9) AS hi
          FROM orders GROUP BY 1)
        SELECT o_orderpriority, count(*)::BIGINT AS n,
               round(avg(o_totalprice), 4) AS mean,
               round(avg(CASE WHEN o_totalprice BETWEEN lo AND hi
                              THEN o_totalprice END), 4) AS trimmed_mean,
               sum(CASE WHEN o_totalprice < lo OR o_totalprice > hi
                        THEN 1 ELSE 0 END)::BIGINT AS n_trimmed
        FROM orders JOIN f ON f.g = o_orderpriority
        GROUP BY 1
        ORDER BY 1""")),

    // ----- q174: Tukey-fence outliers per priority (Warehouse
    // .iqrOutliers) — the distribution-free boxplot rule, exact
    // quartiles broadcast back as fences.
    Q("q174_iqr_outliers",
      (s, d) =>
        Warehouse.iqrOutliers(orders(s, d), "o_orderpriority",
          "o_totalprice").orderBy("o_orderpriority"),
      Some("""
        WITH q AS (
          SELECT o_orderpriority AS g,
                 quantile_cont(o_totalprice, 0.25) AS q1,
                 quantile_cont(o_totalprice, 0.75) AS q3
          FROM orders GROUP BY 1),
        f AS (
          SELECT g, q1, q3, q1 - 1.5 * (q3 - q1) AS lo,
                 q3 + 1.5 * (q3 - q1) AS hi
          FROM q)
        SELECT o_orderpriority, count(*)::BIGINT AS n,
               round(max(q1), 4) AS q1, round(max(q3), 4) AS q3,
               round(max(lo), 4) AS lo_fence, round(max(hi), 4)
                 AS hi_fence,
               sum(CASE WHEN o_totalprice < lo OR o_totalprice > hi
                        THEN 1 ELSE 0 END)::BIGINT AS n_outliers
        FROM orders JOIN f ON f.g = o_orderpriority
        GROUP BY 1
        ORDER BY 1""")),

    // ----- q175: session-basket association rules (TimeSeries
    // .associationRules) — support/confidence/lift for event-type pairs
    // co-occurring in gap-cut sessions; the market-basket trio over the
    // behavioral stream.
    Q("q175_association_rules",
      (s, d) =>
        // 6 h gap: harness users emit ~2 events/day, so the default
        // 30 min gap yields single-event baskets and an empty report
        TimeSeries.associationRules(events(s, d), gapSeconds = 21600)
          .orderBy("ante", "cons"),
      Some("""
        WITH g AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1) OVER w
                        > 21600000000
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
          SELECT *, sum(new_s) OVER (PARTITION BY user_id
                   ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)
                 AS sess_id
          FROM g),
        baskets AS (
          SELECT DISTINCT user_id, sess_id, event_type AS item
          FROM sess),
        ns AS (
          SELECT count(*)::DOUBLE AS n FROM (
            SELECT DISTINCT user_id, sess_id FROM baskets)),
        itemn AS (SELECT item, count(*) AS ni FROM baskets GROUP BY 1),
        p AS (
          SELECT l.item AS ante, r.item AS cons, count(*) AS n_sessions
          FROM baskets l JOIN baskets r
            ON l.user_id = r.user_id AND l.sess_id = r.sess_id
           AND l.item != r.item
          GROUP BY 1, 2)
        SELECT ante, cons, n_sessions::BIGINT AS n_sessions,
               round(n_sessions / n, 4) AS support,
               round(n_sessions / na.ni, 4) AS confidence,
               round((n_sessions / na.ni) / (nb.ni / n), 4) AS lift
        FROM p
        JOIN itemn na ON na.item = p.ante
        JOIN itemn nb ON nb.item = p.cons
        CROSS JOIN ns
        WHERE n_sessions / n >= 0.01
        ORDER BY ante, cons""")),

    // ----- q176: weekly traffic composition (TimeSeries
    // .weeklyComposition) — event-type shares per ISO week, the time
    // axis the static q77 composition and endpoint q97 drift lack.
    Q("q176_weekly_composition",
      (s, d) =>
        TimeSeries.weeklyComposition(events(s, d))
          .orderBy("week_start", "event_type"),
      Some("""
        WITH c AS (
          SELECT date_trunc('week', ts)::DATE AS week_start,
                 event_type, count(*) AS n
          FROM events GROUP BY 1, 2),
        t AS (SELECT week_start, sum(n) AS wt FROM c GROUP BY 1)
        SELECT c.week_start, c.event_type, c.n::BIGINT AS n,
               round(c.n / t.wt, 4) AS share
        FROM c JOIN t USING (week_start)
        ORDER BY week_start, event_type""")),

    // ----- q177: conversion by signup-week cohort (TimeSeries
    // .cohortConversion) — q140's decision grouped by acquisition week:
    // does conversion quality drift across cohorts?
    Q("q177_cohort_conversion",
      (s, d) =>
        TimeSeries.cohortConversion(events(s, d)).orderBy("cohort_week"),
      Some("""
        WITH ff AS (
          SELECT user_id AS u, min(ts) AS from_ts
          FROM events WHERE event_type = 'signup' GROUP BY 1),
        tos AS (
          SELECT user_id, ts AS to_ts
          FROM events WHERE event_type = 'purchase'),
        lags AS (
          SELECT u, from_ts, min(to_ts) AS first_to
          FROM ff LEFT JOIN tos
            ON ff.u = tos.user_id
           AND epoch_us(to_ts) >= epoch_us(from_ts)
          GROUP BY 1, 2)
        SELECT date_trunc('week', from_ts)::DATE AS cohort_week,
               count(*)::BIGINT AS n_users,
               count(first_to)::BIGINT AS n_converted,
               round(count(first_to) / count(*)::DOUBLE, 4) AS cvr
        FROM lags GROUP BY 1
        ORDER BY cohort_week""")),

    // ----- q178: effective dataset size — the "how big is it really"
    // answer: raw token mass vs the mass surviving exact dedup (min-id
    // keeper per fingerprint), and the inflation ratio. Composes the
    // verified fingerprint keeper with token counting; one row.
    Q("q178_effective_size",
      (s, d) => {
        val docs = documents(s, d)
        val toks = docs.select(col("doc_id"),
          size(array_remove(split(trim(col("text")), "\\s+"), "")).cast("long").as("t"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
        val keepers = toks.groupBy("fp").agg(min("doc_id").as("doc_id"))
          .select("doc_id")
        val kept = toks.join(keepers, "doc_id")
        toks.agg(count(lit(1)).as("n_docs"),
            sum("t").as("raw_tokens"))
          .crossJoin(broadcast(
            kept.agg(count(lit(1)).as("n_unique_docs"),
              sum("t").as("effective_tokens"))))
          .select(col("n_docs"), col("raw_tokens"),
            col("n_unique_docs"), col("effective_tokens"),
            round(col("raw_tokens") /
              when(col("effective_tokens") > 0, col("effective_tokens")),
              4).as("inflation"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id,
                 len(list_filter(regexp_split_to_array(trim(text), '\s+'), xw -> xw <> ''))::BIGINT
                   AS t,
                 md5(trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
          FROM documents),
        keepers AS (SELECT min(doc_id) AS doc_id FROM toks GROUP BY fp),
        kept AS (SELECT t.* FROM toks t JOIN keepers USING (doc_id)),
        raw AS (
          SELECT count(*) AS n_docs, sum(t) AS raw_tokens FROM toks),
        eff AS (
          SELECT count(*) AS n_unique_docs, sum(t) AS effective_tokens
          FROM kept)
        SELECT n_docs::BIGINT AS n_docs, raw_tokens::BIGINT AS raw_tokens,
               n_unique_docs::BIGINT AS n_unique_docs,
               effective_tokens::BIGINT AS effective_tokens,
               round(raw_tokens / (CASE WHEN effective_tokens > 0
                 THEN effective_tokens END)::DOUBLE, 4) AS inflation
        FROM raw, eff""")))

  /** q123 oracle: synchronous LPA unrolled — per round, neighbor-label
    * counts then the (count DESC, label ASC) argmin. MATERIALIZED per
    * level (hitsOracle precedent: plain CTEs re-inline the whole chain
    * per reference). */
  private def labelPropOracle(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""c$k AS MATERIALIZED (
          SELECT u.a AS node, l.label, count(*) AS c
          FROM und u JOIN l${k - 1} l ON u.b = l.node
          GROUP BY 1, 2),
        l$k AS MATERIALIZED (
          SELECT node, label FROM (
            SELECT node, label,
                   row_number() OVER (PARTITION BY node
                                      ORDER BY c DESC, label) AS rn
            FROM c$k) WHERE rn = 1)"""
    }.mkString(",\n        ")
    s"""
        WITH $edgesCte,
        l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label FROM und),
        $steps
        SELECT node, label FROM l$iters ORDER BY node"""
  }

  /** The q31 language-ID scoring replayed as a `preds(doc_id, lang,
    * pred)` CTE — shared by the q153/q154 evaluation oracles. */
  private val langIdPredsCtes: String = """scores AS (
          SELECT doc_id, lang,
            length(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|ein|nicht)\b')) AS s_de,
            length(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|a)\b')) AS s_en,
            length(regexp_extract_all(lower(text), '\b(el|la|de|que|y|los|en)\b')) AS s_es,
            length(regexp_extract_all(lower(text), '\b(le|la|les|et|des|un|est)\b')) AS s_fr,
            length(regexp_extract_all(lower(text), '\b(de5|shi4|le5|zai4|wo3|you3|he2)\b')) AS s_zh
          FROM documents),
        preds AS (
          SELECT doc_id, lang,
                 CASE
                   WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                   WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                   WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
                   WHEN s_fr >= s_zh THEN 'fr'
                   ELSE 'zh'
                 END AS pred
          FROM scores)"""

  /** q152 oracle: personalized PageRank unrolled — restart mass lands
    * only on the seed set; init rank = 1/|seeds| on seeds, else 0. */
  private def pprOracle(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""c$k AS MATERIALIZED (
          SELECT e.dst AS node, sum(r.rank / o.outdeg) AS c
          FROM edges e
          JOIN r${k - 1} r ON e.src = r.node
          JOIN outdeg o ON o.src = e.src
          GROUP BY 1),
        r$k AS MATERIALIZED (
          SELECT rs.node, rs.restart + 0.85 * coalesce(c$k.c, 0) AS rank
          FROM restart rs LEFT JOIN c$k USING (node))"""
    }.mkString(",\n        ")
    s"""
        WITH edges AS (
          SELECT source AS src, 'src' || ((doc_id * doc_id + 1) % 13) AS dst
          FROM documents
          WHERE source != 'src' || ((doc_id * doc_id + 1) % 13)),
        sd AS (SELECT node FROM (VALUES ('src1'), ('src4')) v(node)),
        nodes AS (
          SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges
            UNION SELECT dst FROM edges
            UNION SELECT node FROM sd)),
        consts AS (SELECT count(*)::DOUBLE AS ns FROM sd),
        outdeg AS (
          SELECT src, count(*)::DOUBLE AS outdeg FROM edges GROUP BY 1),
        restart AS MATERIALIZED (
          SELECT n.node,
                 CASE WHEN s.node IS NOT NULL THEN 0.15 / ns
                      ELSE 0 END AS restart
          FROM nodes n LEFT JOIN sd s USING (node), consts),
        r0 AS (SELECT node, restart / 0.15 AS rank FROM restart),
        $steps
        SELECT node, round(rank, 6) AS rank
        FROM r$iters
        ORDER BY node"""
  }

  /** q125 oracle: BFS min-distance unrolled — frontier step k joins the
    * previous round's dist table at dist = k−1, then a min-merge. */
  private def khopOracle(maxHops: Int): String = {
    val steps = (1 to maxHops).map { k =>
      s"""s$k AS MATERIALIZED (
          SELECT e.dst AS node, $k AS dist
          FROM e JOIN d${k - 1} d ON e.src = d.node AND d.dist = ${k - 1}),
        d$k AS MATERIALIZED (
          SELECT node, min(dist) AS dist FROM (
            SELECT * FROM d${k - 1} UNION ALL SELECT * FROM s$k)
          GROUP BY 1)"""
    }.mkString(",\n        ")
    s"""
        WITH edges AS (
          SELECT source AS src, 'src' || ((doc_id * doc_id + 1) % 13) AS dst
          FROM documents
          WHERE source != 'src' || ((doc_id * doc_id + 1) % 13)),
        e AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
        d0 AS MATERIALIZED (
          SELECT node, 0 AS dist
          FROM (VALUES ('src1'), ('src4')) v(node)),
        $steps
        SELECT node, dist FROM d$maxHops ORDER BY node"""
  }
}
