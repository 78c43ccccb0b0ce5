"""Query registry for the driver correctness gate (`__spark_entry__.py`).

One entry per operator family from SURVEY.md §2 plus the corpus-pipeline
operators (dedupe / similarity / text analysis / multimodal).  Each
entry pairs a Spark DataFrame builder with an exact ANSI-SQL twin that
DuckDB runs on the same parquet tables; the driver hash-compares rows.

Cross-engine determinism rules used throughout (so value-hashes match):

- Float aggregates: per-row arithmetic in DOUBLE (IEEE-deterministic),
  then CAST to DECIMAL(38,6) before SUM (order-free exact sum), then
  CAST back to DOUBLE and round — identical bits in both engines.
- Hashes: md5-backed (``textops.md5i60``) — reproducible in SQL as
  ``('0x' || substr(md5(x), 1, 15))::BIGINT``; never engine-private
  hashes in checked output.
- Rank/limit cuts: ordered by (value, id) with explicit tie-breaks.
- Threshold predicates compare ROUNDED similarity values on both sides
  so the cut is made on identical numbers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from . import dedupe, embeddings, multimodal, textops

# name -> (spark_fn, oracle_sql | None)
REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, sql)
        return fn
    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dec_sum(c, alias: str, scale: int = 2):
    """Order-free exact sum of a double expression, rounded → double."""
    return F.round(F.sum(c.cast("decimal(38,6)")).cast("double"), scale).alias(alias)


# =====================================================================
# §2.2 projections / filters
# =====================================================================

@q("p1_project_filter", """
SELECT doc_id, lang, n_chars FROM documents
WHERE n_chars BETWEEN 100 AND 400 AND source = 'src3'
""")
def p1_project_filter(spark, sf_dir):
    """P1 column pruning + P6 size predicate: pushed to the parquet scan."""
    return (
        t(spark, sf_dir, "documents")
        .where((F.col("n_chars").between(100, 400)) & (F.col("source") == "src3"))
        .select("doc_id", "lang", "n_chars")
    )


@q("p3_freshness_window", """
SELECT event_type, COUNT(*)::BIGINT AS n_recent FROM events
WHERE ts > (SELECT max(ts) FROM events) - INTERVAL 3 DAY
GROUP BY event_type
""")
def p3_freshness_window(spark, sf_dir):
    """P3 recrawl-freshness predicate (3-day window, model.ts:45-50)."""
    ev = t(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("max_ts"))
    return (
        ev.join(F.broadcast(mx))
        .where(F.col("ts") > F.col("max_ts") - F.expr("INTERVAL 3 DAYS"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_recent"))
    )


# =====================================================================
# §2.4 / §2.5 aggregations + windows
# =====================================================================

@q("a1_latest_per_user", """
SELECT user_id, event_id AS last_event_id FROM (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
  FROM events) WHERE rn = 1
""")
def a1_latest_per_user(spark, sf_dir):
    """A1 max-by latest row per key (model.ts:169-190), deterministic
    tie-break on event_id."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max_by("event_id", F.struct("ts", "event_id")).alias("last_event_id"))
    )


@q("w1_rank_latest", """
SELECT user_id, event_id, value FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
  FROM events) WHERE rn = 1
""")
def w1_rank_latest(spark, sf_dir):
    """W1 newest-first ranking per key (row_number window)."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "value")
    )


@q("w2_topk_per_group", """
SELECT c_mktsegment, c_custkey, c_acctbal, rk FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
  FROM customer) WHERE rk <= 5
""")
def w2_topk_per_group(spark, sf_dir):
    """W2 per-group top-k (the per-host politeness quota shape)."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        t(spark, sf_dir, "customer")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 5)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rk")
    )


@q("a3_sorted_concat", """
SELECT r_name, string_agg(n_name, ' ' ORDER BY n_name) AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""")
def a3_sorted_concat(spark, sf_dir):
    """A3 deterministic string concatenation (sorted collect_list)."""
    return (
        t(spark, sf_dir, "nation")
        .join(F.broadcast(t(spark, sf_dir, "region")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), " ").alias("nations"))
    )


@q("a4_first_tokens", """
SELECT array_to_string((string_split(text, ' '))[1:3], ' ') AS prefix,
       COUNT(*)::BIGINT AS n_docs
FROM documents GROUP BY 1
""")
def a4_first_tokens(spark, sf_dir):
    """A4/F4 first-segment extraction + fold (substring_index)."""
    return (
        t(spark, sf_dir, "documents")
        .select(F.substring_index("text", " ", 3).alias("prefix"))
        .groupBy("prefix")
        .agg(F.count("*").alias("n_docs"))
    )


@q("agg_pricing_summary", """
SELECT l_returnflag, l_linestatus,
  round(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 2) AS sum_qty,
  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 2) AS sum_base_price,
  round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 2) AS sum_disc_price,
  COUNT(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""")
def agg_pricing_summary(spark, sf_dir):
    """Partial+final agg showcase (TPC-H Q1 shape); decimal-exact sums."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum(F.col("l_quantity"), "sum_qty"),
            dec_sum(F.col("l_extendedprice"), "sum_base_price"),
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


# =====================================================================
# §2.3 joins
# =====================================================================

@q("j1_lookup_join", """
SELECT c_mktsegment, COUNT(*)::BIGINT AS n_orders,
  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 2) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""")
def j1_lookup_join(spark, sf_dir):
    """J1 lookup join (url → latest doc shape): fact ⋈ dim + agg."""
    return (
        t(spark, sf_dir, "orders")
        .join(t(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), dec_sum(F.col("o_totalprice"), "total_price"))
    )


@q("j2_anti_join", """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
""")
def j2_anti_join(spark, sf_dir):
    """J2 anti-join (URL-seen dedupe shape): keys with no match.

    The probe side is filtered (status 'F') so the anti-join survives
    non-trivially at every SF (5 / 71 / 511 rows at sf0.001/0.01/0.1) —
    an unfiltered probe matches every customer and the oracle row set
    would be empty, a vacuous hash match."""
    return (
        t(spark, sf_dir, "customer")
        .join(t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F"),
              F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@q("j3_broadcast_dim", """
SELECT r_name, COUNT(*)::BIGINT AS n_customers,
  round(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 2) AS avg_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""")
def j3_broadcast_dim(spark, sf_dir):
    """J3 broadcast dimension join (language-dim shape, lang.ts:3-17)."""
    return (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(t(spark, sf_dir, "nation")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t(spark, sf_dir, "region")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double")
                / F.count("*"), 2,
            ).alias("avg_acctbal"),
        )
    )


@q("j4_semi_join", """
SELECT o_orderstatus, COUNT(*)::BIGINT AS n FROM orders o
WHERE EXISTS (SELECT 1 FROM customer c
              WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 9000)
GROUP BY o_orderstatus
""")
def j4_semi_join(spark, sf_dir):
    """J4 semi-join membership (RTL-list shape, lang.ts:19-32)."""
    rich = t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000)
    return (
        t(spark, sf_dir, "orders")
        .join(rich, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


@q("j5_self_theta_join", """
SELECT a.n_name AS nation_a, b.n_name AS nation_b, a.n_regionkey AS regionkey
FROM nation a JOIN nation b
  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
""")
def j5_self_theta_join(spark, sf_dir):
    """J5 self-join with theta condition (other-language-versions shape,
    ssr.ts:98-109)."""
    n = t(spark, sf_dir, "nation")
    a, b = n.alias("a"), n.alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_name").alias("nation_a"),
        F.col("b.n_name").alias("nation_b"),
        F.col("a.n_regionkey").alias("regionkey"),
    )


@q("j8_copartition_join", """
SELECT o_orderpriority,
  round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 2) AS revenue,
  COUNT(*)::BIGINT AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""")
def j8_copartition_join(spark, sf_dir):
    """J8 big fact-fact join (frontier → pages fetch shape): sort-merge
    on the join key, decimal-exact revenue."""
    return (
        t(spark, sf_dir, "lineitem")
        .join(t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").alias("n_items"),
        )
    )


# =====================================================================
# §2.6 / §2.7 sorts, limits, set ops
# =====================================================================

@q("o1_topk_orders", """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
""")
def o1_topk_orders(spark, sf_dir):
    """O1/O2 global top-k with deterministic tie-break."""
    return (
        t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@q("o3_pagination_limit", """
SELECT event_id, event_type FROM events ORDER BY event_id LIMIT 700
""")
def o3_pagination_limit(spark, sf_dir):
    """O3 bounded pagination (7 pages × 100, ssr.ts:715-726)."""
    return (
        t(spark, sf_dir, "events")
        .orderBy("event_id")
        .limit(700)
        .select("event_id", "event_type")
    )


@q("set_union_except", """
(SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
 UNION
 SELECT DISTINCT user_id FROM events WHERE event_type = 'signup')
EXCEPT
SELECT DISTINCT user_id FROM events WHERE event_type = 'error' AND value > 90
""")
def set_union_except(spark, sf_dir):
    """§2.7 union + except (frontier delta = links EXCEPT seen).

    The except side is restricted to high-value errors so the result is
    non-empty at every SF (4 / 14 / 177 rows at sf0.001/0.01/0.1) —
    every user has at least one plain error event, so an unrestricted
    EXCEPT would be a vacuous 0-row hash match."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id")
    signups = ev.where(F.col("event_type") == "signup").select("user_id")
    errors = ev.where((F.col("event_type") == "error")
                      & (F.col("value") > 90)).select("user_id")
    return clicks.union(signups).distinct().subtract(errors)


# =====================================================================
# §2.8 scalar functions
# =====================================================================

@q("f_string_kit", """
SELECT doc_id,
  split_part(text, ' ', 1) AS first_token,
  len(string_split(trim(text), ' '))::BIGINT AS n_tokens,
  upper(lang) AS lang_up,
  substr(text, 1, 20) AS head20,
  source LIKE 'src1%' AS is_src1
FROM documents
""")
def f_string_kit(spark, sf_dir):
    """F1-F7 string kit: trim/split/first-segment/case/substr/prefix."""
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring_index("text", " ", 1).alias("first_token"),
        F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("n_tokens"),
        F.upper("lang").alias("lang_up"),
        F.substring("text", 1, 20).alias("head20"),
        F.col("source").startswith("src1").alias("is_src1"),
    )


@q("f_json_extract", """
SELECT event_type, COUNT(*)::BIGINT AS n,
  CAST(SUM(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
  round(CAST(SUM(json_extract_string(props, '$.k')::BIGINT) AS DOUBLE) / COUNT(*), 2) AS avg_k
FROM events GROUP BY event_type
""")
def f_json_extract(spark, sf_dir):
    """F14 JSON field extraction + numeric agg."""
    ev = t(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("long")
    )
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k").alias("sum_k"),
        F.round(F.sum("k").cast("double") / F.count("*"), 2).alias("avg_k"),
    )


@q("f_date_bucket", """
SELECT strftime(o_orderdate, '%Y-%m') AS ym, COUNT(*)::BIGINT AS n_orders,
  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 2) AS total
FROM orders GROUP BY 1
""")
def f_date_bucket(spark, sf_dir):
    """F10 date formatting + time-bucket rollup."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("ym"))
        .agg(F.count("*").alias("n_orders"), dec_sum(F.col("o_totalprice"), "total"))
    )


@q("w4_tumbling_window", """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
  COUNT(*)::BIGINT AS n,
  round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 2) AS sum_value
FROM events GROUP BY 1, 2
""")
def w4_tumbling_window(spark, sf_dir):
    """Tumbling event-time window rollup (1-day buckets): the windowed
    aggregation shape of a metrics/lineage pipeline."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dec_sum(F.col("value"), "sum_value"))
        .select(F.col("w.start").alias("day"), "event_type", "n", "sum_value")
    )


@q("text_top_bigrams", """
SELECT bigram, COUNT(*)::BIGINT AS n FROM (
  SELECT unnest(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i+1])) AS bigram
  FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents) WHERE len(toks) >= 2)
GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 50
""")
def text_top_bigrams(spark, sf_dir):
    """Corpus-wide n-gram frequency top-k (vocabulary analysis shape):
    explode bigrams → count → deterministic top-50."""
    toks = textops.tokens("text")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i),
                                  F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        t(spark, sf_dir, "documents")
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(50)
    )


def _langdim_sql() -> str:
    """Oracle twin of langdim.normalize_lang + is_rtl over documents:
    the SAME Python-resolved (form → iso3) map the engine broadcasts
    (first-match-wins, langdim.form_map) inlined as VALUES, so both
    engines join byte-identical forms."""
    from .langdim import RTL_CODES_3, form_map

    def esc(s: str) -> str:
        return s.replace("'", "''")

    values = ", ".join(
        f"('{esc(form)}', '{iso3}')" for form, iso3 in sorted(form_map().items())
    )
    rtl = ", ".join(f"'{c}'" for c in RTL_CODES_3)
    return f"""
WITH forms AS (SELECT * FROM (VALUES {values}) v(form, iso639_3))
SELECT m.iso639_3 AS lang3,
       coalesce(m.iso639_3 IN ({rtl}), FALSE) AS rtl,
       COUNT(*)::BIGINT AS n_docs
FROM documents d LEFT JOIN forms m ON lower(trim(d.lang)) = m.form
GROUP BY 1, 2
"""


@q("j3_lang_normalize", _langdim_sql())
def j3_lang_normalize(spark, sf_dir):
    """J3/J4: language-code normalization via the broadcast ISO-639 dim
    (lang.ts:3-17) + RTL membership (lang.ts:19-32)."""
    from .langdim import is_rtl, normalize_lang

    d = normalize_lang(t(spark, sf_dir, "documents"))
    return (
        d.withColumn("rtl", F.coalesce(is_rtl("lang3"), F.lit(False)))
        .groupBy("lang3", "rtl")
        .agg(F.count("*").alias("n_docs"))
    )


# =====================================================================
# corpus pipeline: text analysis
# =====================================================================

@q("text_token_stats", """
SELECT lang, COUNT(*)::BIGINT AS n_docs,
  round(CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) AS DOUBLE)
        / COUNT(*), 2) AS avg_tokens,
  round(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 2) AS avg_chars
FROM documents GROUP BY lang
""")
def text_token_stats(spark, sf_dir):
    """Token counting rollup per language."""
    d = t(spark, sf_dir, "documents").withColumn(
        "n_tokens", textops.token_count("text").cast("long")
    )
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.sum("n_tokens").cast("double") / F.count("*"), 2).alias("avg_tokens"),
        F.round(F.sum("n_chars").cast("double") / F.count("*"), 2).alias("avg_chars"),
    )


@q("text_quality", """
SELECT doc_id,
  len(toks)::BIGINT AS n_tokens,
  round(len(list_filter(toks, x -> x IN ('a','the','of','and','in','to','is','for')))::DOUBLE
        / len(toks), 3) AS stop_ratio,
  round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks), 3) AS avg_tok_len
FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents WHERE trim(text) <> '')
WHERE len(toks) > 0
""")
def text_quality(spark, sf_dir):
    """Per-document quality signals: token count, stopword ratio,
    mean token length."""
    toks = textops.tokens("text")
    return (
        t(spark, sf_dir, "documents")
        .where(F.size(toks) > 0)
        .select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            F.round(textops.stopword_ratio("text"), 3).alias("stop_ratio"),
            F.round(textops.avg_token_len("text"), 3).alias("avg_tok_len"),
        )
    )


_LANGID_PROFILES = {
    "rel": ("table", "row", "scan", "column"),
    "phy": ("hash", "merge", "batch", "join"),
    "kv": ("key", "value", "part", "group"),
}

@q("text_langid", """
SELECT doc_id,
  CASE WHEN greatest(h_rel, h_phy, h_kv) = 0 THEN 'und'
       WHEN h_rel = greatest(h_rel, h_phy, h_kv) THEN 'rel'
       WHEN h_phy = greatest(h_rel, h_phy, h_kv) THEN 'phy'
       ELSE 'kv' END AS guess
FROM (
  SELECT doc_id,
    len(list_filter(toks, x -> lower(x) IN ('table','row','scan','column'))) AS h_rel,
    len(list_filter(toks, x -> lower(x) IN ('hash','merge','batch','join'))) AS h_phy,
    len(list_filter(toks, x -> lower(x) IN ('key','value','part','group'))) AS h_kv
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents))
""")
def text_langid(spark, sf_dir):
    """Marker-profile language-ID (argmax with first-profile tie-break)."""
    return t(spark, sf_dir, "documents").select(
        "doc_id", textops.langid("text", _LANGID_PROFILES).alias("guess")
    )


@q("text_fingerprint_dups", """
SELECT fp, COUNT(*)::BIGINT AS n_docs, MIN(doc_id) AS min_doc
FROM (SELECT doc_id,
        ('0x' || substr(md5(array_to_string(
           (regexp_split_to_array(trim(text), '\\s+'))[1:8], ' ')), 1, 15))::BIGINT AS fp
      FROM documents)
GROUP BY fp HAVING COUNT(*) > 1
""")
def text_fingerprint_dups(spark, sf_dir):
    """Document fingerprinting: first-8-token shingle hash; groups
    sharing a fingerprint are prefix near-dups."""
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", textops.fingerprint("text", 8).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc"))
        .where(F.col("n_docs") > 1)
    )


# =====================================================================
# corpus pipeline: deduplication
# =====================================================================

@q("dedup_exact", """
SELECT md5(text) AS content_md5, MIN(doc_id) AS doc_id, COUNT(*)::BIGINT AS n_copies
FROM documents GROUP BY 1
""")
def dedup_exact(spark, sf_dir):
    """Exact dedupe: survivors per content hash (min doc_id wins)."""
    return dedupe.exact_dedupe(t(spark, sf_dir, "documents"))


# the mega-bucket cap is generated from the engine's own constant so
# the two sides can never drift
_MINHASH_SQL = """
WITH base AS (
  SELECT doc_id AS did,
         list_distinct(list_transform(range(1, len(toks) - 1),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents)
  WHERE len(toks) >= 3
), sig AS (
  SELECT did, sh,
    list_transform(range(0, 16), s ->
      list_min(list_transform(hs, h ->
        (((1103515245::BIGINT * (s + 1) + 12345) % 2147483647) * h
         + ((69069::BIGINT * (s + 1) + 1) % 2147483647)) % 2147483647))) AS sig
  FROM (SELECT did, sh,
          list_transform(sh, x ->
            ('0x' || substr(md5(x), 1, 15))::BIGINT & 2147483647) AS hs
        FROM base)
), bands AS (
  SELECT did, b.band_id,
    md5(array_to_string(list_transform(
      sig[b.band_id*2+1 : b.band_id*2+2], v -> v::VARCHAR), ',')) AS band_key
  FROM sig, (SELECT range AS band_id FROM range(0, 8)) b
), bands_c AS (
  SELECT did, band_id, band_key,
         COUNT(*) OVER (PARTITION BY band_id, band_key) AS bn
  FROM bands
), cand AS (
  SELECT DISTINCT l.did AS id_a, r.did AS id_b
  FROM bands_c l JOIN bands_c r
    ON l.band_id = r.band_id AND l.band_key = r.band_key
       AND l.did < r.did AND l.bn <= {MAX_BUCKET}
)
SELECT id_a, id_b,
  round(len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(a.sh || b.sh)), 4) AS jacc
FROM cand JOIN base a ON a.did = id_a JOIN base b ON b.did = id_b
WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(a.sh || b.sh)), 4) >= 0.5
""".replace("{MAX_BUCKET}", str(dedupe.DEFAULT_MAX_BUCKET_ROWS))


@q("dedup_minhash_lsh", _MINHASH_SQL)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup pairs (K=16, 8 bands × 2 rows) with exact
    Jaccard verification; the oracle replicates the full signature and
    banding computation bit-for-bit."""
    return dedupe.minhash_lsh_pairs(
        t(spark, sf_dir, "documents"), shingle_n=3, k=16, bands=8, threshold=0.5
    )


@q("dedup_simhash", """
SELECT doc_id,
  CAST(list_sum(list_transform(range(0, 60), b ->
    CASE WHEN list_sum(list_transform(th, h ->
           CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS simhash
FROM (SELECT doc_id,
        list_distinct(list_transform(regexp_split_to_array(trim(text), '\\s+'),
          x -> ('0x' || substr(md5(x), 1, 15))::BIGINT)) AS th
      FROM documents WHERE len(trim(text)) > 0)
""")
def dedup_simhash(spark, sf_dir):
    """60-bit SimHash signature per document (bit-majority over distinct
    token hashes)."""
    return dedupe.simhash(t(spark, sf_dir, "documents"))


@q("dedup_ngram_jaccard", """
WITH base AS (
  SELECT lang, doc_id AS did,
         list_distinct(list_transform(range(1, len(toks) - 1),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
  FROM (SELECT lang, doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents)
  WHERE len(toks) >= 3)
SELECT a.lang, a.did AS id_a, b.did AS id_b,
  round(len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(a.sh || b.sh)), 4) AS jacc
FROM base a JOIN base b ON a.lang = b.lang AND a.did < b.did
WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(a.sh || b.sh)), 4) >= 0.5
""")
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact trigram-Jaccard pairs within a language block (quadratic
    fallback; scale path is dedup_minhash_lsh)."""
    return dedupe.ngram_jaccard_pairs(
        t(spark, sf_dir, "documents"), block_col="lang", shingle_n=3, threshold=0.5
    )


@q("dedup_embedding_cosine", """
SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 3) AS sim
FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 3) >= 0.35
""")
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding near-dup pairs (cosine >= 0.35) within a label block."""
    return embeddings.embedding_near_dups(
        t(spark, sf_dir, "embeddings"), block_col="label", threshold=0.35
    )


# =====================================================================
# corpus pipeline: similarity search
# =====================================================================

@q("ann_topk_cosine", """
SELECT b.vec_id,
  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 3) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id != 0
ORDER BY sim DESC, b.vec_id ASC LIMIT 10
""")
def ann_topk_cosine(spark, sf_dir):
    """Brute-force cosine top-10 vs. vector 0 (ANN correctness baseline)."""
    return embeddings.ann_topk(t(spark, sf_dir, "embeddings"), query_id=0, k=10)


@q("ann_lsh_buckets", """
SELECT CAST(list_sum(list_transform(range(0, 8), p ->
    CASE WHEN list_sum(list_transform(range(1, 65), d ->
           embedding[d]::DOUBLE *
           (('0x' || substr(md5(p::VARCHAR || ',' || (d-1)::VARCHAR), 1, 15))::BIGINT
            / 576460752303423488.0 - 1.0))) > 0
         THEN (1::BIGINT << p) ELSE 0::BIGINT END)) AS BIGINT) AS bucket,
  COUNT(*)::BIGINT AS n_vectors
FROM embeddings GROUP BY 1
""")
def ann_lsh_buckets(spark, sf_dir):
    """Hyperplane-LSH signature histogram — the bucket layout of the
    scale-path ANN (md5-derived deterministic planes)."""
    return embeddings.lsh_buckets(t(spark, sf_dir, "embeddings"), n_planes=8)


@q("ann_topk_lsh", """
WITH sig AS (
  SELECT vec_id, embedding,
    CAST(list_sum(list_transform(range(0, 8), p ->
      CASE WHEN list_sum(list_transform(range(1, 65), d ->
             embedding[d]::DOUBLE *
             (('0x' || substr(md5(p::VARCHAR || ',' || (d-1)::VARCHAR), 1, 15))::BIGINT
              / 576460752303423488.0 - 1.0))) > 0
           THEN (1::BIGINT << p) ELSE 0::BIGINT END)) AS BIGINT) AS bucket
  FROM embeddings),
probes AS (
  SELECT qvec, unnest(buckets) AS bucket FROM (
    SELECT embedding AS qvec,
           [bucket] || list_transform(range(0, 8),
                                      p -> xor(bucket, (1::BIGINT << p))) AS buckets
    FROM sig WHERE vec_id = 0))
SELECT s.vec_id,
  round(list_cosine_similarity(s.embedding::DOUBLE[], p.qvec::DOUBLE[]), 3) AS sim
FROM sig s JOIN probes p ON s.bucket = p.bucket AND s.vec_id != 0
ORDER BY sim DESC, s.vec_id ASC LIMIT 10
""")
def ann_topk_lsh_q(spark, sf_dir):
    """LSH multi-probe ANN: probe the query's bucket + its 1-bit flips,
    exact cosine within candidates, top-k on (rounded sim, id).  The
    md5-derived hyperplane signature is shared bit-for-bit with the
    `ann_lsh_buckets` oracle, so the probe set — and therefore the
    candidate set — is identical in both engines; recall vs the
    brute-force baseline is additionally asserted in pytest."""
    return embeddings.ann_topk_lsh(
        t(spark, sf_dir, "embeddings"), query_id=0, k=10, n_planes=8
    )


# =====================================================================
# corpus pipeline: multimodal plumbing
# =====================================================================

@q("multimodal_features", """
SELECT doc_id::BIGINT AS media_id,
  (octet_length(encode(text)) +
   CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 39 ELSE 13 END)::BIGINT AS n_bytes,
  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END AS format,
  (doc_id % 640 + 1)::INTEGER AS width,
  ((doc_id * 7) % 480 + 1)::INTEGER AS height
FROM documents
""")
def multimodal_features(spark, sf_dir):
    """Real image-header codec via Arrow mapInPandas: `as_media` plants
    genuine PNG/JPEG/GIF headers (dims derived from doc_id), the
    extractor PARSES them back (PNG IHDR / JPEG SOFn scan / GIF screen
    descriptor — crawlkit.multimodal.decode_image); the oracle predicts
    the planted values arithmetically, so any parse bug hash-fails."""
    return multimodal.extract_features(
        multimodal.as_media(t(spark, sf_dir, "documents"))
    )


@q("streaming_windowed_rollup", """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
  event_type AS status, COUNT(*)::BIGINT AS n_pages,
  CAST(SUM(event_id % 1000) AS BIGINT) AS total_bytes
FROM events GROUP BY 1, 2
""")
def streaming_windowed_rollup(spark, sf_dir):
    """Structured Streaming execution path, oracle-checked THROUGH THE
    PRODUCTION DRAIN (VERDICT r3 item 7): events are shaped into
    results rows, staged as warehouse files, tailed through the
    streaming plan (file source → watermark → windowed agg), drained
    by ``warehouse_sink`` (checkpointed foreachBatch → idempotent
    epoch-overwrite parquet) and READ BACK from the epoch layout —
    which must equal the same rollup as plain SQL, because a single
    availableNow trigger drops nothing at the watermark.  Complete-
    mode aggregate: the latest epoch is the whole result.
    """
    import tempfile

    from . import streaming

    ev = t(spark, sf_dir, "events")
    url = F.concat(
        F.lit("https://h"), (F.col("user_id") % 5).cast("string"),
        F.lit(".example/"), F.col("event_id").cast("string"),
    )
    rows = ev.select(
        F.lit(None).cast("binary").alias("id"),
        url.alias("url"),
        url.alias("url_canon"),
        F.col("event_id").cast("long").alias("url_hash"),
        F.concat(F.lit("h"), (F.col("user_id") % 5).cast("string"),
                 F.lit(".example")).alias("host"),
        url.alias("src"),
        F.lit("t").alias("title"),
        F.create_map().cast("map<string,string>").alias("meta"),
        F.lit(None).cast("binary").alias("content"),
        F.lit(None).cast("string").alias("html"),
        (F.col("event_id") % 1000).cast("long").alias("page_len"),
        F.lit(None).cast("string").alias("text"),
        F.lit("en").alias("lang"),
        F.col("event_type").alias("status"),
        F.lit(0).cast("int").alias("depth"),
        F.col("ts").alias("fetched_ts"),
        F.lit(1).cast("int").alias("round"),
    )
    from .storage import Warehouse

    base = tempfile.mkdtemp(prefix="crawlkit-stream-q-")
    wh = Warehouse(base)
    wh.write(rows, "results", 1)
    wh.commit_round(1, {"results": wh.row_count("results", 1)})
    sink_root = streaming.warehouse_sink(
        streaming.windowed_status_rollup(
            streaming.stream_results(spark, base), "1 day", "3 days"
        ),
        base, "rollup", f"{base}/ckpt",
        output_mode="complete",
    )
    # read back from the epoch layout (the same files a deployment
    # reads); the tmp dir must stay alive behind the returned lazy
    # frame, so defer cleanup to process exit instead of leaking one
    # staged-warehouse + checkpoint tree per invocation (bench.py runs
    # this query every suite)
    import atexit
    import shutil

    atexit.register(shutil.rmtree, base, ignore_errors=True)
    return streaming.read_epochs(spark, sink_root, latest_only=True)


# =====================================================================
# crawl engine end-to-end (non-SQL-expressible → rows-only check)
# =====================================================================

def crawl_round_smoke(spark, sf_dir):
    """Three crawl rounds WITH a mid-crawl resume on the deterministic
    synthetic corpus (VERDICT r3 item 6): round 1 runs, the driver
    'restarts' (a fresh run_crawl against the same warehouse resumes
    from the manifest), rounds 2-3 run, and the full multi-round
    results table comes back as (url, title, status, depth, round).
    The row set is deterministic — invariant under shuffle-partition
    count and cluster size (north_rule; property-tested in
    tests/test_rounds.py) — so the driver's rows-only check covers the
    stateful multi-round + checkpoint/resume path, not just round 1.
    No SQL oracle can express the stateful round loop; the pytest
    oracle simulator (tests/oracle_sim.py) is the equality check."""
    import tempfile

    from .rounds import CrawlConfig, run_crawl
    from .synth import SynthConfig, robots_df, seeds_df, synth_pages

    import atexit
    import shutil

    scfg = SynthConfig(n_pages=80, n_hosts=5, n_seeds=5, fanout=3)
    pages = synth_pages(spark, scfg)
    cfg = CrawlConfig(warehouse=tempfile.mkdtemp(prefix="crawlkit-smoke-"))
    # the returned frame reads lazily from this warehouse; clean at exit
    atexit.register(shutil.rmtree, cfg.warehouse, ignore_errors=True)
    seeds, robots = seeds_df(spark, scfg), robots_df(spark, scfg)
    run_crawl(spark, cfg, pages, seeds, robots, max_rounds=1)
    # mid-crawl resume: a fresh driver picks up from the committed
    # manifest (T6) — no seeds/robots needed, state carries over
    run_crawl(spark, cfg, pages, max_rounds=2)
    from .schema import RESULTS_SCHEMA
    from .storage import Warehouse

    wh = Warehouse(cfg.warehouse)
    res = wh.read(spark, "results", RESULTS_SCHEMA)
    return res.select("url", "title", "status", "depth", "round").orderBy("url")

REGISTRY["crawl_round_smoke"] = (crawl_round_smoke, None)
