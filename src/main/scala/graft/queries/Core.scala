package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.Tables._

/** Core relational operator coverage: aggregations, matches/filters,
  * joins (broadcast / semi / anti), ratios, time bucketing, union
  * (distinct-collect), union_count, top-k, windows.
  *
  * Each query mirrors a reference capability (SURVEY.md §2, cited per
  * query) re-expressed as a declarative Spark plan, and carries a
  * DuckDB oracle with byte-identical column names and deterministic
  * ordering. Floating sums go through DecimalType for order-independent
  * exactness (see Tables.dsum).
  */
object Core {

  type QFn = (SparkSession, String) => DataFrame

  val entries: Vector[Q] = Vector(

    // ---- aggregations (reference: miw/log_record.cc merge kernel) ----

    // sum/max/min/mean/count over a composite group key.
    Q("q01_agg_basic", (s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("logs"),
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          davg(col("l_quantity")).as("avg_qty"),
          max(col("l_quantity")).as("max_qty"),
          min(col("l_extendedprice")).as("min_price"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }, Some("""
      SELECT l_returnflag, l_linestatus, count(*) AS logs,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
             max(l_quantity) AS max_qty, min(l_extendedprice) AS min_price
      FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""")),

    // top-k by count desc, key asc (reference: mr_job.cc:74-107 ndisp display)
    Q("q02_topk_users", (s, d) => {
      t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("logs"))
        .orderBy(col("logs").desc, col("user_id").asc)
        .limit(10)
    }, Some("""
      SELECT user_id, count(*) AS logs FROM events
      GROUP BY 1 ORDER BY logs DESC, user_id ASC LIMIT 10""")),

    // ---- matches / filters (reference: log_format.cc:327-399) ----

    // exact match set, keep (match exact:true)
    Q("q03_match_exact_in", (s, d) => {
      t(s, d, "events")
        .filter(col("event_type").isin("error", "signup"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("logs"), dsum(col("value")).as("sum_value"))
        .orderBy(col("event_type"))
    }, Some(s"""
      SELECT event_type, count(*) AS logs, ${sqlDsum("value")} AS sum_value
      FROM events WHERE event_type IN ('error', 'signup')
      GROUP BY 1 ORDER BY 1""")),

    // substring match, keep (match logic:"and")
    Q("q04_match_contains", (s, d) => {
      t(s, d, "documents")
        .filter(col("text").contains("join"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("logs"))
        .orderBy(col("lang"))
    }, Some("""
      SELECT lang, count(*) AS logs FROM documents
      WHERE text LIKE '%join%' GROUP BY 1 ORDER BY 1""")),

    // negative substring match, drop (match negative:true)
    Q("q05_match_negative", (s, d) => {
      t(s, d, "documents")
        .filter(!col("text").contains("join"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("logs"))
        .orderBy(col("lang"))
    }, Some("""
      SELECT lang, count(*) AS logs FROM documents
      WHERE text NOT LIKE '%join%' GROUP BY 1 ORDER BY 1""")),

    // match_file dictionary, keep -> broadcast left-semi join
    // (reference: log_format.cc:283-311 loads the dict once and shares it;
    //  distributed analog is a broadcast semi join)
    Q("q06_semi_join", (s, d) => {
      val urgent = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      t(s, d, "lineitem")
        .join(broadcast(urgent), col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("logs"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }, Some(s"""
      SELECT l_returnflag, count(*) AS logs, ${sqlDsum("l_quantity")} AS sum_qty
      FROM lineitem WHERE l_orderkey IN
        (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
      GROUP BY 1 ORDER BY 1""")),

    // match_file negative dictionary, drop -> broadcast left-anti join
    Q("q07_anti_join", (s, d) => {
      val o = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      t(s, d, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("logs"))
        .orderBy(col("c_nationkey"))
    }, Some("""
      SELECT c_nationkey, count(*) AS logs FROM customer
      WHERE c_custkey NOT IN
        (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      GROUP BY 1 ORDER BY 1""")),

    // ---- joins (beyond-reference capability; scale-critical) ----

    // fact x small dim: broadcast hash join, no shuffle of the fact side
    Q("q08_join_broadcast", (s, d) => {
      val p = t(s, d, "part").select(col("p_partkey"), col("p_brand"))
      t(s, d, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("logs"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("p_brand"))
    }, Some(s"""
      SELECT p_brand, count(*) AS logs, ${sqlDsum("l_quantity")} AS sum_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1 ORDER BY 1""")),

    // multi-way star join with selective filters (TPC-H Q5 shape)
    Q("q09_join_multi", (s, d) => {
      val cust = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
                col("o_orderdate") <  lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      // discounted price in cents·basis-points int64 (exact: both
      // columns carry 2 decimals) — the DECIMAL×DECIMAL form ran this
      // multiply per lineitem row inside the scan and dominated the
      // join stage at 100× (see q10's identical fix)
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          (round(col("l_extendedprice") * 100).cast(LongType) *
            (lit(100L) - round(col("l_discount") * 100).cast(LongType)))
            .as("disc_price_e4"))
      val supp = t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val nat = t(s, d, "nation")
      val reg = t(s, d, "region").filter(col("r_name") === "ASIA")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey") &&
                    col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg((sum(col("disc_price_e4")).cast(DoubleType) / lit(10000.0)).as("revenue"),
             count(lit(1)).as("logs"))
        .orderBy(col("revenue").desc, col("n_name"))
    }, Some("""
      SELECT n_name,
             CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) *
                      (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)
               / 10000.0 AS revenue,
             count(*) AS logs
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY 1 ORDER BY revenue DESC, n_name""")),

    // ---- ratio: post-aggregation projection (log_record.cc:747-823) ----

    // the discounted-price product sums through CENTS-scaled int64
    // (price and discount both carry 2 decimals → round(x·100) is an
    // exact integer; the product sum is exact, order-independent,
    // and stays in codegen long arithmetic). The earlier
    // DECIMAL×DECIMAL aggregate was bit-identical but ~12× slower at
    // 100× data — Decimal multiply in the inner loop dominated the
    // scan. Both engines run the same int64 formula and the same
    // single int64→double conversion + division, so the hash compare
    // holds bit-exactly.
    Q("q10_ratio", (s, d) => {
      val cents = round(col("l_extendedprice") * 100).cast(LongType)
      val discBp = round(col("l_discount") * 100).cast(LongType)
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("logs"),
          dsum(col("l_quantity")).as("sum_qty"),
          (sum(cents * (lit(100L) - discBp)).cast(DoubleType) / lit(10000.0))
            .as("sum_disc_price"),
          dsum(col("l_extendedprice")).as("sum_price"))
        .withColumn("disc_ratio", col("sum_disc_price") / col("sum_price"))
        .withColumn("qty_per_log", col("sum_qty") / col("logs"))
        .orderBy(col("l_returnflag"))
    }, Some(s"""
      SELECT *, sum_disc_price / sum_price AS disc_ratio,
             sum_qty / logs AS qty_per_log
      FROM (
        SELECT l_returnflag, count(*) AS logs,
               ${sqlDsum("l_quantity")} AS sum_qty,
               CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) *
                        (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)
                 / 10000.0 AS sum_disc_price,
               ${sqlDsum("l_extendedprice")} AS sum_price
        FROM lineitem GROUP BY 1) ORDER BY l_returnflag""")),

    // ---- date/time bucketing (log_format.cc:401-472) ----

    // day bucket as group key
    Q("q11_date_bucket_day", (s, d) => {
      t(s, d, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("logs"), dsum(col("value")).as("sum_value"))
        .orderBy(col("day"))
    }, Some(s"""
      SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS logs,
             ${sqlDsum("value")} AS sum_value
      FROM events GROUP BY 1 ORDER BY 1""")),

    // 10-minute tumbling bucket via processing_offset-style arithmetic
    // (evtx.json minute/offset-10 bucketing)
    Q("q12_time_bucket_10min", (s, d) => {
      t(s, d, "events")
        .groupBy(concat(
          date_format(col("ts"), "yyyy-MM-dd HH:"),
          lpad((floor(minute(col("ts")) / 10) * 10).cast("int").cast("string"), 2, "0"))
          .as("bucket"))
        .agg(count(lit(1)).as("logs"))
        .orderBy(col("bucket"))
    }, Some("""
      SELECT strftime(ts, '%Y-%m-%d %H:') ||
             lpad(CAST((minute(ts) // 10) * 10 AS VARCHAR), 2, '0') AS bucket,
             count(*) AS logs
      FROM events GROUP BY 1 ORDER BY 1""")),

    // ---- union / union_count (log_record.cc:57-142) ----

    // distinct-collect as canonically sorted list (SURVEY §7.4 hazard 1:
    // reference order is nondeterministic first-seen; we canonicalize)
    Q("q13_union_set", (s, d) => {
      t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(concat_ws(",",
          array_sort(collect_set((col("user_id") % 50).cast("string")))).as("user_buckets"))
        .orderBy(col("event_type"))
    }, Some("""
      SELECT event_type,
             array_to_string(list_sort(list_distinct(list(CAST(user_id % 50 AS VARCHAR)))), ',') AS user_buckets
      FROM events GROUP BY 1 ORDER BY 1""")),

    // union_count: per-distinct-value occurrence counters
    Q("q14_union_count", (s, d) => {
      t(s, d, "events")
        .select(col("event_type"), (col("user_id") % 20).cast("string").as("bucket"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("event_type"))
        .agg(concat_ws(",",
          array_sort(collect_list(concat(col("bucket"), lit(":"), col("cnt"))))).as("bucket_counts"))
        .orderBy(col("event_type"))
    }, Some("""
      SELECT event_type,
             array_to_string(list_sort(list(bucket || ':' || cnt)), ',') AS bucket_counts
      FROM (SELECT event_type, CAST(user_id % 20 AS VARCHAR) AS bucket, count(*) AS cnt
            FROM events GROUP BY 1, 2)
      GROUP BY 1 ORDER BY 1""")),

    // ---- filter_contain: conditional count (log_format.cc:718-751) ----

    Q("q15_filter_contain", (s, d) => {
      t(s, d, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("logs"),
          sum(when(col("text").contains("join"), 1L).otherwise(0L)).as("join_hits"),
          sum(when(col("text").contains("scan"), 1L).otherwise(0L)).as("scan_hits"))
        .orderBy(col("lang"))
    }, Some("""
      SELECT lang, count(*) AS logs,
             CAST(SUM(CASE WHEN text LIKE '%join%' THEN 1 ELSE 0 END) AS BIGINT) AS join_hits,
             CAST(SUM(CASE WHEN text LIKE '%scan%' THEN 1 ELSE 0 END) AS BIGINT) AS scan_hits
      FROM documents GROUP BY 1 ORDER BY 1""")),

    // ---- Metis demo apps as one-liners (SURVEY §2.10) ----

    // wordcount with top-k (app/wc.cc)
    Q("q16_wordcount", (s, d) => {
      t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
        .limit(20)
    }, Some("""
      SELECT w AS word, count(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY 1 ORDER BY cnt DESC, word LIMIT 20""")),

    // histogram (app/hist.cc): fixed-width binning
    Q("q17_histogram", (s, d) => {
      t(s, d, "events")
        .groupBy(floor(col("value") / 50).cast(LongType).as("bin"))
        .agg(count(lit(1)).as("logs"))
        .orderBy(col("bin"))
    }, Some("""
      SELECT CAST(FLOOR(value / 50) AS BIGINT) AS bin, count(*) AS logs
      FROM events GROUP BY 1 ORDER BY 1""")),

    // linear regression sufficient statistics (app/linear_regression.cc)
    Q("q18_linear_regression", (s, d) => {
      val xDec = col("value").cast(DecimalType(18, 2))
      t(s, d, "events").agg(
        count(lit(1)).as("n"),
        sum(xDec).cast(DoubleType).as("sum_x"),
        sum(col("user_id")).cast(DoubleType).as("sum_y"),
        sum(xDec * xDec).cast(DoubleType).as("sum_xx"),
        sum(xDec * col("user_id").cast(DecimalType(18, 0))).cast(DoubleType).as("sum_xy"),
        sum(col("user_id") * col("user_id")).cast(DoubleType).as("sum_yy"))
        .withColumn("slope",
          (col("n") * col("sum_xy") - col("sum_x") * col("sum_y")) /
          (col("n") * col("sum_xx") - col("sum_x") * col("sum_x")))
    }, Some("""
      SELECT *, (n * sum_xy - sum_x * sum_y) / (n * sum_xx - sum_x * sum_x) AS slope
      FROM (
        SELECT count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_x,
               CAST(SUM(user_id) AS DOUBLE) AS sum_y,
               CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_xx,
               CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(user_id AS DECIMAL(18,0))) AS DOUBLE) AS sum_xy,
               CAST(SUM(user_id * user_id) AS DOUBLE) AS sum_yy
        FROM events)""")),

    // string match counting (app/string_match.cc)
    Q("q19_string_match", (s, d) => {
      t(s, d, "events")
        .filter(col("props") === lit("""{"k": 7}"""))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("logs"))
        .orderBy(col("event_type"))
    }, Some("""
      SELECT event_type, count(*) AS logs FROM events
      WHERE props = '{"k": 7}' GROUP BY 1 ORDER BY 1""")),

    // ---- dedup & text (training-pipeline ops; more in Text/Dedup) ----

    // exact dedup: content-hash grouping with keeper assignment
    Q("q20_dedup_exact", (s, d) => {
      t(s, d, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
        .orderBy(col("h"))
    }, Some("""
      SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n
      FROM documents GROUP BY 1 ORDER BY 1""")),

    // token counting (whitespace tokenizer; array_remove — codegen —
    // not the filter-lambda, which runs an interpreted closure per
    // token in the scan stage)
    Q("q21_token_count", (s, d) => {
      t(s, d, "documents")
        .withColumn("tokens",
          size(graft.functions.ExactCols.tokens(col("text"))))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("logs"),
          sum(col("tokens")).as("sum_tokens"),
          (sum(col("n_chars")).cast(DoubleType) / count(lit(1))).as("avg_chars"))
        .orderBy(col("lang"))
    }, Some("""
      SELECT lang, count(*) AS logs,
             CAST(SUM(length(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS sum_tokens,
             CAST(SUM(n_chars) AS DOUBLE) / count(*) AS avg_chars
      FROM documents GROUP BY 1 ORDER BY 1""")),

    // ---- windows (beyond-reference: analytic functions) ----

    // per-group top-N via row_number window
    Q("q22_window_topn", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val agg = t(s, d, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(dsum(col("value")).as("sum_value"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("sum_value").desc, col("user_id").asc)
      agg.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy(col("event_type"), col("rn"))
    }, Some(s"""
      SELECT * FROM (
        SELECT event_type, user_id, sum_value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY sum_value DESC, user_id ASC) AS rn
        FROM (SELECT event_type, user_id, ${sqlDsum("value")} AS sum_value
              FROM events GROUP BY 1, 2))
      WHERE rn <= 3 ORDER BY event_type, rn""")),

    // join-key skew audit (the operational card behind every AQE/
    // salting decision in this repo: how hot is the hottest join key,
    // in multiples of the mean): per l_orderkey lineitem counts —
    // ONE shuffle, then the narrow (key, cnt) table is cut() and
    // feeds (a) one driver-scalar aggregate for total rows + distinct
    // keys (the q134 rule — a corpus grand-total window here would be
    // the unpartitioned-window scale killer PlanSpec rejects) and
    // (b) the TakeOrdered top-20 with a 20-row rank window.
    // share_ppm = key's corpus share; skew_milli = ⌊1000·cnt·nkeys/
    // total⌋ = multiples of the mean key load (products ≤ cnt·nkeys ≤
    // total·nkeys ~ 10¹²·10¹¹ → DECIMAL(38,0))
    Q("q213_key_skew", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.Checkpoints._
      val counts = t(s, d, "lineitem")
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
        .cut() // feeds the scalar pass and the top-k pass
      val tot = counts.agg(sum(col("cnt")).as("t"), count(lit(1)).as("k"))
        .head()
      val (total, nkeys) = (math.max(tot.getLong(0), 1L), tot.getLong(1))
      val w = Window.orderBy(col("cnt").desc, col("l_orderkey").asc)
      counts.orderBy(col("cnt").desc, col("l_orderkey").asc).limit(20)
        .withColumn("rank", row_number().over(w).cast(LongType))
        .withColumn("share_ppm", expr(s"(1000000L * cnt) div ${total}L"))
        .withColumn("skew_milli", expr(
          s"CAST((CAST(1000 AS DECIMAL(38,0)) * cnt * ${nkeys}L) div " +
            s"CAST(${total} AS DECIMAL(38,0)) AS BIGINT)"))
        .select(col("rank"), col("l_orderkey"), col("cnt"),
          col("share_ppm"), col("skew_milli"))
        .orderBy(col("rank"))
    }, Some("""
      WITH c AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) cnt
                 FROM lineitem GROUP BY 1),
      t AS (SELECT GREATEST(CAST(SUM(cnt) AS BIGINT), 1) total,
              CAST(count(*) AS BIGINT) nkeys FROM c),
      r AS (SELECT l_orderkey, cnt,
              CAST(row_number() OVER (ORDER BY cnt DESC, l_orderkey ASC)
                   AS BIGINT) rank
            FROM c)
      SELECT rank, l_orderkey, cnt,
        CAST((1000000 * cnt) // total AS BIGINT) AS share_ppm,
        CAST((1000 * CAST(cnt AS HUGEINT) * nkeys) // total AS BIGINT)
          AS skew_milli
      FROM r, t WHERE rank <= 20 ORDER BY rank""")),

    // referential-integrity audit (the data-quality gate every
    // ingest runs before joins are trusted — orphan children make
    // inner joins silently DROP rows at scale): per FK edge the child
    // row count and the orphan count. The three lineitem edges ride
    // ONE scan (chained left joins + null-flag sums — never three
    // anti-join passes); orders→customer is its own pass; card =
    // UNION of labeled one-row aggregates (the q121 shape)
    Q("q214_fk_integrity", (s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      val liFlags = li
        .join(t(s, d, "orders").select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left")
        .join(t(s, d, "part").select(col("p_partkey")),
          col("l_partkey") === col("p_partkey"), "left")
        .join(t(s, d, "supplier").select(col("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("orph_o"),
          sum(when(col("p_partkey").isNull, 1L).otherwise(0L)).as("orph_p"),
          sum(when(col("s_suppkey").isNull, 1L).otherwise(0L)).as("orph_s"))
      val liCard = liFlags.select(expr(
        "stack(3, 'lineitem->orders', n_child, orph_o, " +
          "'lineitem->part', n_child, orph_p, " +
          "'lineitem->supplier', n_child, orph_s) AS (edge, n_child, n_orphans)"))
      val oCard = t(s, d, "orders").select(col("o_custkey"))
        .join(t(s, d, "customer").select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit("orders->customer").as("edge"), col("n_child"),
          col("n_orphans"))
      liCard.unionByName(oCard).orderBy(col("edge"))
    }, Some("""
      WITH lif AS (SELECT
              CAST(count(*) AS BIGINT) n_child,
              CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) orph_o,
              CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) orph_p,
              CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) orph_s
            FROM lineitem l
              LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
              LEFT JOIN part p ON l.l_partkey = p.p_partkey
              LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey),
      oc AS (SELECT CAST(count(*) AS BIGINT) n_child,
               CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) n_orphans
             FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey)
      SELECT * FROM (
        SELECT 'lineitem->orders' AS edge, n_child, orph_o AS n_orphans FROM lif
        UNION ALL SELECT 'lineitem->part', n_child, orph_p FROM lif
        UNION ALL SELECT 'lineitem->supplier', n_child, orph_s FROM lif
        UNION ALL SELECT 'orders->customer', n_child, n_orphans FROM oc)
      ORDER BY edge""")),

    // one-row table-profile card for events (the schema/stats summary
    // a profiler emits before planning: row count, distinct entities,
    // time span, raw value range — min/max of a DOUBLE column are
    // exact passthroughs of stored values, no arithmetic ever touches
    // them). One scan, one multi-distinct aggregate
    Q("q215_events_profile", (s, d) => {
      t(s, d, "events")
        .select(col("user_id"), col("event_type"), col("value"),
          unix_timestamp(col("ts")).as("sec"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("event_type")).as("n_types"),
          (max(expr("sec div 86400")) - min(expr("sec div 86400")) + 1L)
            .as("span_days"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
    }, Some("""
      WITH e AS (SELECT user_id, event_type, value,
                   epoch_ms(ts)//1000 sec FROM events)
      SELECT CAST(count(*) AS BIGINT) AS n_events,
        CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
        CAST(MAX(sec // 86400) - MIN(sec // 86400) + 1 AS BIGINT)
          AS span_days,
        MIN(value) AS min_value, MAX(value) AS max_value
      FROM e"""))
  )
}
