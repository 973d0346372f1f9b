"""Graph query surface — the read side.

Covers the reference's projection/filter predicates
(ast/src/lang/graphs/graph.rs:39-154, SURVEY.md §2.3) and its
MCP/REST query operators (mcp/src/graph/queries.ts, SURVEY.md
§2.12): point lookups, substring/suffix predicates, edge-type
projections, counts, existence, latest-N-per-label windows,
pagination, fulltext-ish search, coverage stats, depth-bounded
subtree expansion (apoc.path.expandConfig analog, queries.ts:328-458)
and shortest path (queries.ts:519-548).

All are DataFrame plans over the materialized nodes/edges tables.
Recursive pieces (BFS, shortest path) are bounded driver loops of
hash joins — Catalyst has no recursion; each frontier hop is one
equi-join on a key that is bucketable at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Projections / predicates (graph.rs lookups)
# ---------------------------------------------------------------------------

def find_nodes_by_type(nodes: DataFrame, node_type: str) -> DataFrame:
    """graph.rs:96 find_nodes_by_type."""
    return nodes.where(F.col("node_type") == node_type)


def find_nodes_by_name(nodes: DataFrame, node_type: str, name: str) -> DataFrame:
    """graph.rs:41 find_nodes_by_name (BTree prefix-scan analog)."""
    return nodes.where((F.col("node_type") == node_type) & (F.col("name") == name))


def find_nodes_by_name_contains(nodes: DataFrame, node_type: str, fragment: str) -> DataFrame:
    """graph.rs:106-111 find_nodes_by_name_contains."""
    return nodes.where((F.col("node_type") == node_type) & F.col("name").contains(fragment))


def find_nodes_by_file_ends_with(nodes: DataFrame, node_type: str, suffix: str) -> DataFrame:
    """graph.rs:124-140 find_nodes_by_file_ends_with."""
    return nodes.where((F.col("node_type") == node_type) & F.col("file").endswith(suffix))


def find_node_in_range(nodes: DataFrame, file: str, row: int) -> DataFrame:
    """graph.rs:142-146 find_node_in_range: file=f AND
    start <= row <= end (full reference semantics — the payload
    schema carries `end`)."""
    return nodes.where(
        (F.col("file") == file) & (F.col("start") <= row) & (F.col("end") >= row)
    )


def find_node_at(nodes: DataFrame, node_type: str, file: str, row: int) -> DataFrame:
    """graph.rs:148-152 find_node_at."""
    return nodes.where(
        (F.col("node_type") == node_type) & (F.col("file") == file) & (F.col("start") == row)
    )


META_VAL = "regexp_extract(meta, '(^|;){key}=([^;]*)', 2)"


def meta_value(key: str) -> str:
    """SQL fragment: value of `key` in the flattened meta string
    (identical syntax in Spark SQL and DuckDB)."""
    return META_VAL.format(key=key)


def find_endpoint(nodes: DataFrame, name: str, file: str, verb: str) -> DataFrame:
    """array_graph.rs:327-339 find_endpoint: (name, file, verb)
    point lookup — verb lives in meta (asg.rs:144-147)."""
    return nodes.where(
        (F.col("node_type") == "Endpoint")
        & (F.col("name") == name)
        & (F.col("file") == file)
        & (F.expr(meta_value("verb")) == verb)
    )


def find_resource_nodes(nodes: DataFrame, verb: str, path_fragment: str) -> DataFrame:
    """array_graph.rs:610-633 find_resource_nodes: Endpoint nodes
    whose (normalized) path contains the fragment and whose verb
    matches (contains, case-insensitive on the fragment side)."""
    return nodes.where(
        (F.col("node_type") == "Endpoint")
        & F.lower(F.col("name")).contains(path_fragment.lower())
        & F.expr(meta_value("verb")).contains(verb)
    )


def find_source_edge_by_name_and_file(
    edges: DataFrame, nodes: DataFrame, target_name: str, target_file: str
) -> DataFrame:
    """graph.rs:53-58 / array_graph.rs:512-526: reverse lookup — all
    (edge_type, source_key) whose TARGET node has the given
    (name, file)."""
    tgt = nodes.where(
        (F.col("name") == target_name) & (F.col("file") == target_file)
    ).select(F.col("node_key").alias("target_key"))
    return (
        edges.join(F.broadcast(tgt), "target_key")
        .select("edge_type", "source_key", "target_key")
        .distinct()
    )


def find_nodes_with_edge_type(nodes: DataFrame, edges: DataFrame, edge_type: str) -> DataFrame:
    """graph.rs:97-102: edges of a type joined back to both endpoint
    nodes -> (source_name, source_type, target_name, target_type)."""
    e = edges.where(F.col("edge_type") == edge_type)
    src = nodes.select(
        F.col("node_key").alias("source_key"),
        F.col("name").alias("source_name"),
        F.col("node_type").alias("source_type"),
    )
    dst = nodes.select(
        F.col("node_key").alias("target_key"),
        F.col("name").alias("target_name"),
        F.col("node_type").alias("target_type"),
    )
    return (
        e.join(src, "source_key")
        .join(dst, "target_key")
        .select("source_key", "source_name", "source_type", "target_key", "target_name", "target_type")
    )


def count_edges_of_type(edges: DataFrame) -> DataFrame:
    """array_graph.rs:719-727."""
    return edges.groupBy("edge_type").agg(F.count("*").alias("n"))


def has_edge(edges: DataFrame, source_key: str, target_key: str, edge_type: str) -> bool:
    """array_graph.rs:736-746 — existence via limit(1)."""
    return (
        edges.where(
            (F.col("source_key") == source_key)
            & (F.col("target_key") == target_key)
            & (F.col("edge_type") == edge_type)
        ).limit(1).count()
        > 0
    )


# ---------------------------------------------------------------------------
# Windows / top-k / pagination
# ---------------------------------------------------------------------------

def latest_per_type(nodes: DataFrame, limit_per_type: int) -> DataFrame:
    """queries.ts:189-203 'latest N per label': row_number over
    (node_type) ordered by (start DESC, node_key) — deterministic
    tie-break by key, not insertion order."""
    w = Window.partitionBy("node_type").orderBy(F.desc("start"), F.asc("node_key"))
    return (
        nodes.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= limit_per_type)
        .drop("rk")
    )


def paginate(df: DataFrame, order_cols: list[str], skip: int, limit: int) -> DataFrame:
    """queries.ts:55-61 SKIP/LIMIT as a row_number window."""
    w = Window.orderBy(*[F.asc(c) for c in order_cols])
    return (
        df.withColumn("rk", F.row_number().over(w))
        .where((F.col("rk") > skip) & (F.col("rk") <= skip + limit))
        .drop("rk")
    )


def page_by_cursor(
    df: DataFrame, order_cols: list[str], cursor: tuple | None = None, limit: int = 25
) -> DataFrame:
    """Keyset (cursor) pagination — the scale-safe restatement of the
    reference's SKIP/LIMIT paging (queries.ts:55-61, explore.ts):
    rows strictly AFTER `cursor` (the order_cols values of the last
    row of the previous page) in lexicographic order, first `limit`.

    Unlike paginate()'s single-partition row_number window (and
    Neo4j's SKIP, which walks past every skipped row), the cursor is
    a sargable predicate — page N costs the same as page 1 and the
    filter pushes to the scan when the table is sorted/bucketed by
    the order key. Deterministic iff order_cols is a unique key
    (include node_key last). The caller feeds the last row of each
    page back as the next cursor; None starts from the beginning.
    """
    out = df
    if cursor is not None:
        key = F.struct(*[F.col(c) for c in order_cols])
        out = df.where(key > F.struct(*[F.lit(v) for v in cursor]))
    return out.orderBy(*[F.asc(c) for c in order_cols]).limit(limit)


# ---------------------------------------------------------------------------
# Search (fulltext analog, queries.ts:266-306)
# ---------------------------------------------------------------------------

def search_nodes(
    nodes: DataFrame,
    query: str,
    limit: int = 25,
    skip_tests: bool = True,
    include_body: bool = False,
) -> DataFrame:
    """Tokenized term-match scoring over node names (and, with
    include_body, bodies — the reference's composite name+body
    fulltext index, queries.ts:10-51): score = name hits * 2 + body
    hits (name matches rank above body matches, as a fielded index
    would); ties broken by node_key for determinism. skip_tests
    mirrors the reference's default exclusion of test node types
    (queries.ts:32-51)."""
    terms = [t for t in query.lower().split() if t]
    score = None
    for t in terms:
        hit = F.when(F.lower(F.col("name")).contains(t), 2).otherwise(0)
        if include_body:
            hit = hit + F.when(F.lower(F.col("body")).contains(t), 1).otherwise(0)
        score = hit if score is None else score + hit
    out = nodes.withColumn("score", score)
    if skip_tests:
        out = out.where(~F.col("node_type").isin("UnitTest", "IntegrationTest", "E2etest"))
    return (
        out.where(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("node_key"))
        .limit(limit)
    )


# whitespace token count of a node body — the per-node token_count
# analog (neo4j_utils.rs:74-75; tiktoken replaced by the declared
# whitespace proxy, textstats.py). Parses in both dialects modulo
# the split function name.
TOKENS_SPARK = "size(split(trim(body), '\\\\s+'))"


def token_index(nodes: DataFrame, max_body_df: int | None = None) -> DataFrame:
    """Inverted fulltext index over name+body — the analog of the
    reference's Neo4j fulltext indexes (standard analyzer over name
    and body, queries.ts:10-51; built once, queried by term).
    -> (token, node_key, field) with field in ('name', 'body'),
    distinct per (token, node_key, field); tokens lowercased and
    split on non-alphanumerics (the standard-analyzer shape).

    max_body_df: stopword policy for BODY postings — a token whose
    body posting list exceeds this document frequency ('the', 'and',
    boilerplate) is dropped from the body side of the index; such a
    token matches nearly everything, so its posting list dominates
    every index-search join while adding ~no ranking signal (the same
    hot-key bound as dedup's MAX_POSTING shingle cap). NAME postings
    are never capped: exact-name lookups must always hit. One count
    aggregate (map-side combined) + a semi-join.

    At scale this is a MATERIALIZED table bucketed by token: a
    search becomes a semi-join against the query's term list instead
    of a full scan of every node's body per query — the difference
    between an index lookup and a 100 TB table scan.
    """
    def side(col: str) -> DataFrame:
        return nodes.selectExpr(
            f"explode(array_distinct(filter(split(lower({col}), '[^a-z0-9]+'), t -> t != ''))) AS token",
            "node_key",
            f"'{col}' AS field",
        )

    body = side("body")
    if max_body_df is not None:
        cold = (
            body.groupBy("token")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_body_df)
            .select("token")
        )
        body = body.join(cold, "token", "left_semi")
    return side("name").unionByName(body)


def search_via_index(
    index: DataFrame,
    nodes: DataFrame,
    query: str,
    limit: int = 25,
    skip_tests: bool = True,
) -> DataFrame:
    """Fulltext search against the inverted index: score = 2 x
    distinct matched name-terms + 1 x distinct matched body-terms
    (fielded weighting, same as search_nodes), evaluated WITHOUT
    scanning node bodies — the index join touches only the posting
    lists of the query's terms. Deterministic (score DESC, node_key).
    """
    terms = sorted({t for t in query.lower().split() if t})
    spark = index.sparkSession
    term_df = F.broadcast(
        spark.sql(
            "SELECT * FROM VALUES "
            + ", ".join("('" + t.replace("'", "''") + "')" for t in terms)
            + " AS t(token)"
        )
    )
    scored = (
        index.join(term_df, "token")
        .groupBy("node_key")
        .agg(
            F.expr(
                "CAST(2 * count(DISTINCT CASE WHEN field = 'name' THEN token END)"
                " + count(DISTINCT CASE WHEN field = 'body' THEN token END) AS INT)"
            ).alias("score")
        )
    )
    out = nodes.join(scored, "node_key")
    if skip_tests:
        out = out.where(~F.col("node_type").isin("UnitTest", "IntegrationTest", "E2etest"))
    return (
        out.select("node_key", "node_type", "name", "file", "start", "score")
        .orderBy(F.desc("score"), F.asc("node_key"))
        .limit(limit)
    )


def token_census(nodes: DataFrame) -> DataFrame:
    """Per-node-type body token totals — the repo-map token rollup
    (mcp/src/graph/graph.ts:262-277) as an aggregate."""
    return (
        nodes.selectExpr("node_type", f"CAST({TOKENS_SPARK} AS BIGINT) AS tokens")
        .groupBy("node_type")
        .agg(F.expr("CAST(sum(tokens) AS BIGINT)").alias("total_tokens"))
    )


# ---------------------------------------------------------------------------
# Coverage (graph_ops.rs:234-308, 517-542)
# ---------------------------------------------------------------------------

def coverage_stats(nodes: DataFrame, edges: DataFrame, target_type: str = "Class") -> DataFrame:
    """covered = target nodes referenced by >=1 USES/CALLS edge;
    stat = (total, covered, percent). countDistinct is exact here;
    approx_count_distinct is the stated fallback at 10^12 scale."""
    targets = nodes.where(F.col("node_type") == target_type).select("node_key")
    covered = (
        edges.where(F.col("edge_type").isin("USES", "CALLS"))
        .select(F.col("target_key").alias("node_key"))
        .join(targets, "node_key", "left_semi")
        .distinct()
    )
    total = targets.agg(F.count("*").alias("total"))
    cov = covered.agg(F.count("*").alias("covered"))
    return total.crossJoin(cov).select(
        F.lit(target_type).alias("target_type"),
        F.col("total").cast("bigint").alias("total"),
        F.col("covered").cast("bigint").alias("covered"),
        F.round(F.col("covered") * 100.0 / F.col("total"), 2).alias("percent"),
    )


def list_uncovered(nodes: DataFrame, edges: DataFrame, target_type: str = "Class") -> DataFrame:
    """graph_ops.rs:517-542 — left-anti join, ordered for pagination."""
    targets = nodes.where(F.col("node_type") == target_type)
    referenced = (
        edges.where(F.col("edge_type").isin("USES", "CALLS"))
        .select(F.col("target_key").alias("node_key"))
        .distinct()
    )
    return targets.join(referenced, "node_key", "left_anti").orderBy("node_key")


# ---------------------------------------------------------------------------
# Iterative graph traversal (no Catalyst recursion)
# ---------------------------------------------------------------------------

TRAVERSAL_EDGE_TYPES = ("RENDERS", "CALLS", "CONTAINS", "HANDLER", "OPERAND")

# Above this many keys a traversal frontier/visited set is no longer
# broadcast (driver/executor memory), and the hop becomes a shuffle
# join on the (bucketable) edge source key.
BROADCAST_FRONTIER_MAX = 2_000_000


def subtree(
    edges: DataFrame,
    root_keys: DataFrame,
    depth: int,
    edge_types: tuple[str, ...] = TRAVERSAL_EDGE_TYPES,
    direction: str = "down",
) -> DataFrame:
    """Depth-bounded BFS expansion (queries.ts:328-458
    apoc.path.expandConfig analog): iterative frontier joins with a
    visited-set anti-join; returns (node_key, depth) with the MINIMUM
    depth each node is first reached at.

    root_keys: DataFrame with column node_key.
    Each hop is one equi-join on the frontier key + one aggregate;
    localCheckpoint per hop cuts lineage so depth-d plans stay O(1).
    """
    e = edges.where(F.col("edge_type").isin(*edge_types))
    if direction == "down":
        e = e.select(F.col("source_key").alias("src"), F.col("target_key").alias("dst"))
    else:
        e = e.select(F.col("target_key").alias("src"), F.col("source_key").alias("dst"))

    visited = root_keys.select("node_key").distinct().withColumn("depth", F.lit(0))
    visited = visited.localCheckpoint(eager=True)
    frontier = visited
    frontier_n = visited_n = visited.count()
    for d in range(1, depth + 1):
        # Broadcast the frontier/visited sets only while they are
    	# small (they start as python-list-backed DataFrames with
        # unknown 8 EiB stats, so the hint is needed for the planner
        # to pick the right side). Past the threshold — e.g. a
        # CONTAINS expansion from the root, whose frontier IS the
        # node set — broadcasting would OOM the driver at scale, so
        # the hop falls back to a shuffle join on src (the edge table
        # is bucketable by source_key at rest).
        f = frontier.select(F.col("node_key").alias("src"))
        v = visited.select("node_key")
        if frontier_n <= BROADCAST_FRONTIER_MAX:
            f = F.broadcast(f)
        if visited_n <= BROADCAST_FRONTIER_MAX:
            v = F.broadcast(v)
        nxt = (
            e.join(f, "src")
            .select(F.col("dst").alias("node_key"))
            .distinct()
            .join(v, "node_key", "left_anti")
            .withColumn("depth", F.lit(d))
        )
        nxt = nxt.localCheckpoint(eager=True)
        frontier_n = nxt.count()
        if frontier_n == 0:
            break
        visited = visited.unionByName(nxt)
        visited_n += frontier_n
        frontier = nxt
    return visited


def repo_map(
    nodes: DataFrame,
    edges: DataFrame,
    root_key: str,
    depth: int = 3,
) -> DataFrame:
    """Repo map (mcp/src/graph/graph.ts:210-278): the CONTAINS-only
    subtree rendered as an indented ASCII tree with per-node token
    counts (the archy rendering + tiktoken totals, graph.ts:230-277).

    Returns (path, line): `path` is the /-joined name path (sorting
    by it yields the tree's display order); `line` is the indented
    'name (tokens)' row. CONTAINS is a forest (every node has one
    container), so no visited set is needed.
    """
    e = edges.where(F.col("edge_type") == "CONTAINS").select(
        F.col("source_key").alias("src"), F.col("target_key").alias("dst")
    )
    info = nodes.selectExpr(
        "node_key", "name", f"CAST({TOKENS_SPARK} AS BIGINT) AS tokens"
    )
    cur = (
        info.where(F.col("node_key") == root_key)
        .selectExpr("node_key", "name AS path", "name", "tokens")
    ).localCheckpoint(eager=True)
    out = cur
    cur_n = cur.count()
    for _ in range(1, depth + 1):
        if cur_n == 0:
            break
        # The depth-1 frontier (directories) is tiny, but depth 2-3 is
        # every conversation File / every turn Function — at corpus
        # scale that frontier IS the node set, and broadcasting it
        # each hop would OOM. Gate exactly as subtree() does: small
        # frontier -> broadcast; past BROADCAST_FRONTIER_MAX the hop
        # becomes a shuffle join on src (edges bucketable by
        # source_key at rest).
        f = cur.select(F.col("node_key").alias("src"), F.col("path").alias("ppath"))
        if cur_n <= BROADCAST_FRONTIER_MAX:
            f = F.broadcast(f)
        cur = (
            e.join(f, "src")
            .join(info, e["dst"] == info["node_key"])
            .selectExpr("node_key", "ppath || '/' || name AS path", "name", "tokens")
        ).localCheckpoint(eager=True)
        cur_n = cur.count()
        if cur_n == 0:
            break
        out = out.unionByName(cur)
    return out.selectExpr(
        "path",
        # indent = tree depth = number of '/' in the path
        "repeat('  ', CAST(length(path) - length(replace(path, '/', '')) AS INT))"
        " || name || ' (' || CAST(tokens AS STRING) || ')' AS line",
    )


def shortest_path(
    edges: DataFrame, from_key: str, to_key: str, max_depth: int = 10,
    edge_types: tuple[str, ...] | None = None,
) -> list[str] | None:
    """queries.ts:519-548 — BFS with parent tracking. Parents stay in
    a DISTRIBUTED (node_key, parent) DataFrame throughout — nothing
    frontier-sized is ever collected to the driver (a large component
    would OOM it); the only driver-side transfers are a limit(1)
    target probe per hop and, after the target is reached, one
    single-row lookup per path step during reconstruction (bounded by
    max_depth). Frontier/visited broadcasts are gated by
    BROADCAST_FRONTIER_MAX exactly as in subtree(). Returns the
    node_key path or None."""
    e = edges
    if edge_types:
        e = e.where(F.col("edge_type").isin(*edge_types))
    # undirected expansion, as apoc shortestPath treats relationships
    sym = e.select(F.col("source_key").alias("src"), F.col("target_key").alias("dst")).unionByName(
        e.select(F.col("target_key").alias("src"), F.col("source_key").alias("dst"))
    )
    spark = edges.sparkSession
    visited = spark.sql(
        "SELECT node_key, parent FROM VALUES ('"
        + from_key.replace("'", "''")
        + "', CAST(NULL AS STRING)) AS t(node_key, parent)"
    ).localCheckpoint(eager=True)
    frontier = visited
    frontier_n = visited_n = 1
    found = from_key == to_key
    for _ in range(max_depth):
        if found:
            break
        f = frontier.select(F.col("node_key").alias("src"))
        v = visited.select("node_key")
        if frontier_n <= BROADCAST_FRONTIER_MAX:
            f = F.broadcast(f)
        if visited_n <= BROADCAST_FRONTIER_MAX:
            v = F.broadcast(v)
        nxt = (
            sym.join(f, "src")
            .groupBy(F.col("dst").alias("node_key"))
            .agg(F.min("src").alias("parent"))  # deterministic parent pick
            .join(v, "node_key", "left_anti")
            .localCheckpoint(eager=True)
        )
        frontier_n = nxt.count()
        if frontier_n == 0:
            return None
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        visited_n += frontier_n
        frontier = nxt
        found = nxt.where(F.col("node_key") == to_key).limit(1).count() > 0
    if not found:
        return None
    # Path reconstruction: one 1-row point lookup per step against the
    # distributed parent table (<= max_depth lookups, each a
    # key-predicate scan — an index/bucket probe at rest).
    path = [to_key]
    while path[-1] != from_key:
        row = visited.where(F.col("node_key") == path[-1]).select("parent").first()
        path.append(row["parent"])
    return list(reversed(path))
