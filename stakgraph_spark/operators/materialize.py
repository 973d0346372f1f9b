"""Typed node/edge materialization (the graph tables).

Produces the two output tables mirroring the reference schema
(SURVEY.md §1.3; NodeData ast/src/lang/asg.rs:66-82) with the FULL
payload:

  nodes(node_key, node_type, name, file, start, end, body, docs,
        hash, data_type, meta)
  edges(edge_type, source_key, target_key)

`meta` is the reference's open string->string map serialized as a
canonical sorted 'k=v;k=v' string — the reference itself flattens
meta at serialization time (asg.rs:84-120) and in the Neo4j mapping
(asg.rs:325-349), so flat-at-rest matches the on-wire format.

Identity follows the reference exactly: node_key recipe
(utils.rs:67-90, verb arm utils.rs:83-88), edge dedup on
(src, dst, type) (array_graph.rs:775-781) — the reference's bulk
edge write is CREATE not MERGE (neo4j_utils.rs:169-175), so dedup
MUST happen here.

Node vocabulary — all 19 reference NodeTypes (mod.rs:27-50):
  Repository corpus root          Language   role stratum (repo.rs:215-300 analog)
  Directory  conversation bucket  File       conversation
  Import     per-conv system-turn rollup (combine_import_sections,
             builder/utils.rs:39-87)
  Function   turn                 Library    tool
  Class/Trait/Datamodel/Feature/Page/Var  dictionary entities
  Instance   alias row of a Class entity (collect.rs:22-23)
  UnitTest/IntegrationTest/E2etest  planted test ids, classified
             tid%3 (classify_test analog, queries/mod.rs:183)
  Endpoint   dictionary           Request    request occurrence
             (format.rs requests-within-functions)

Edge vocabulary — all 12 reference EdgeTypes (mod.rs:71-88):
  CONTAINS  repo->lang/dir, dir->conv, conv->turn/import/test,
            turn->request (builder scaffold, core.rs:46-90);
            conv->extracted Var (get_vars scaffold); turn Function->
            Var under the same-file/imported/same-dir tier cascade
            (format.rs:561-617, operators/collect.py); turn Function
            -> Datamodel from return-section type identifiers
            (format.rs:621-644)
  USES      turn -> canonical entity (linked mention, plus per-turn
            CamelCase candidates typed by exact canonical name —
            collect.rs:40-59)
  CALLS     turn -> tool Library; Request -> Endpoint
            (link_api_nodes, linker.rs:129-163); Test -> referencing
            turn (shared-test-id link, linker.rs:56-127)
  HANDLER   endpoint -> first referencing turn (handler_finder
            analog, queries/mod.rs:208-223)
  OF        Instance -> Class (mod.rs:168-174); alias-member entity
            -> canonical entity (canonicalization collapse)
  OPERAND   Class/Trait -> Function entity (mod.rs:197-203, planted)
  ARG_OF    tool turn (Function) -> entity passed as the tool-call
            argument (mod.rs:78 Function->Arg)
  IMPORTS   conv File -> entities mentioned in turn 0 (top-of-file
            import section analog, file_imports mod.rs:218-224);
            Class -> Class planted includes (array_graph.rs:247-266)
  INCLUDES  Feature -> turn mentioning it (mod.rs:83 Feature->any)
  RENDERS   Page -> turn mentioning it (mod.rs:182-195)
  PARENT_OF parent Class -> child Class (array_graph.rs:229-246)
  IMPLEMENTS Class -> Trait (collect.rs:60-81)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.keys import node_key, node_key_py, node_key_sql
from ..sources import entities as E
from . import canon as canon_op
from . import extract as X

REPO_KEY = "repository-corpus-corpus-0"
MAX_FILE_SIZE = 500_000  # builder/utils.rs:9 — body dropped above, node kept
NULL_S = "CAST(NULL AS STRING)"


# Key expressions are built as SQL strings (one F.expr bridge call)
# rather than nested Column ops: the sandbox py4j bridge costs ~6ms
# per Column call, and node_key expands to ~16 nested calls — across
# the 20+ edge/node families that is seconds of pure driver latency.

def _conv_key_sql(conv: str) -> str:
    return node_key_sql("'File'", conv, f"'corpus/' || {conv}", "0", "spark")


def _turn_key_sql(conv: str, turn: str) -> str:
    return node_key_sql(
        "'Function'",
        f"'turn_' || CAST({turn} AS STRING)",
        f"'corpus/' || {conv}",
        turn,
        "spark",
    )


def _lang_key_sql(role: str) -> str:
    return node_key_sql("'Language'", role, "'corpus'", "0", "spark")


def _dir_key_sql(bucket: str) -> str:
    return node_key_sql("'Directory'", bucket, f"'corpus/' || {bucket}", "0", "spark")


def _import_key_sql(conv: str, start: str) -> str:
    return node_key_sql("'Import'", "'imports'", f"'corpus/' || {conv}", start, "spark")


TEST_TYPE_SQL = (
    "CASE CAST({tid} AS INT) % 3 WHEN 0 THEN 'UnitTest' "
    "WHEN 1 THEN 'IntegrationTest' ELSE 'E2etest' END"
)
TEST_KIND_SQL = (
    "CASE CAST({tid} AS INT) % 3 WHEN 0 THEN 'unit' "
    "WHEN 1 THEN 'integration' ELSE 'e2e' END"
)


def _test_type_expr(tid: str, pack: dict | None = None) -> str:
    """The build's classify_test (queries/mod.rs:183): the default
    transcriptish dialect classifies by tid%3; passing a dialect
    pack routes the SAME build through the pack's test_classes rules
    (dialects.classify_test_sql) over the test NAME instead — the
    trait-override-as-data path, live in the production pipeline."""
    if pack and pack.get("test_classes") is not None:
        from .dialects import classify_test_sql

        return classify_test_sql(pack, f"'test_' || {tid}", "spark")
    return TEST_TYPE_SQL.format(tid=tid)


def _test_kind_expr(tid: str, pack: dict | None = None) -> str:
    if pack and pack.get("test_classes") is not None:
        return (
            f"CASE {_test_type_expr(tid, pack)} WHEN 'UnitTest' THEN 'unit' "
            "WHEN 'IntegrationTest' THEN 'integration' ELSE 'e2e' END"
        )
    return TEST_KIND_SQL.format(tid=tid)


def _test_key_sql(tid: str, conv: str, turn: str, pack: dict | None = None) -> str:
    return node_key_sql(
        _test_type_expr(tid, pack),
        f"'test_' || {tid}",
        f"'corpus/' || {conv}",
        turn,
        "spark",
    )


def _request_key_sql(conv: str, turn: str) -> str:
    return node_key_sql(
        "'Request'", "path", f"'corpus/' || {conv}", turn, "spark", verb="verb"
    )


def _var_key_sql(vname: str, conv: str, turn: str) -> str:
    return node_key_sql("'Var'", vname, f"'corpus/' || {conv}", turn, "spark")


BUCKET_SQL = "substring(conv_id, 1, 9)"  # conversation bucket = 100-user directory


def all_entities(spark: SparkSession) -> DataFrame:
    """entities + tools + endpoints with their node types."""
    return (
        E.entities_df(spark)
        .unionByName(E.tools_df(spark))
        .unionByName(
            E.endpoints_df(spark).select(
                "entity_id", "canonical_name", F.lit("Endpoint").alias("entity_type")
            )
        )
    )


_ENTITY_NODES_CACHE: dict = {}


def _canon_parent() -> dict[int, int]:
    """Driver-side union-find over the static SAME_AS pairs."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in E.SAME_AS:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {i: find(i) for i in range(0, 300)}


def _entity_rows() -> list[tuple]:
    """(node_key, node_type, name, file, start, canon_id, data_type, meta)
    for every dictionary entity."""
    find = _canon_parent()
    ep_verbs = {i: v for i, v, _ in E.ENDPOINTS}
    ents = (
        list(E.ENTITIES)
        + list(E.TOOLS)
        + [(i, E.endpoint_name(v, s), "Endpoint") for i, v, s in E.ENDPOINTS]
    )
    # Endpoint keys carry the verb as the 5th node_key arm: the
    # reference's create_node_key appends sanitize(verb) whenever the
    # node's meta carries one (utils.rs:83-88), and
    # process_endpoint_groups already rebuilds rewritten endpoint
    # keys WITH the verb — base keys must agree.
    return [
        (
            node_key_py(t, n, "entities", i, verb=ep_verbs.get(i) if t == "Endpoint" else None),
            t,
            n,
            "entities",
            i,
            find[i],
            None,
            f"verb={ep_verbs[i]}" if t == "Endpoint" else "",
        )
        for i, n, t in ents
    ]


def entity_nodes(spark: SparkSession) -> DataFrame:
    """(node_key, node_type, name, file, start, canon_id, data_type,
    meta) for every dictionary entity, with its canonical component.

    The dictionary is STATIC driver data (Python lists in
    sources/entities.py), so this is computed entirely on the driver
    — union-find over SAME_AS plus the node_key recipe — and handed
    to Spark as one LocalRelation: zero Spark jobs, broadcastable
    as-is. The distributed canonical_map operator exists for
    dictionaries that are themselves tables (and is exercised by
    tests/bench); routing 28 static rows through it costs seconds of
    task-scheduling per session for no data.
    """
    key = (spark.sparkContext.applicationId, "ents")
    if key in _ENTITY_NODES_CACHE:
        return _ENTITY_NODES_CACHE[key]
    lit = spark.createDataFrame(
        _entity_rows(),
        "node_key STRING, node_type STRING, name STRING, file STRING, "
        "start INT, canon_id INT, data_type STRING, meta STRING",
    )
    _ENTITY_NODES_CACHE[key] = lit
    return lit


def instance_nodes(spark: SparkSession) -> DataFrame:
    """Instance nodes — one per alias row of a Class-typed entity
    (reference Instance extraction, collect.rs:22-23), carrying the
    class name as data_type (asg.rs:73). start = the alias row's
    dictionary line so sanitize-colliding aliases ('order-service'
    vs 'orderservice') and shared aliases ('core') keep distinct
    keys."""
    key = (spark.sparkContext.applicationId, "inst")
    if key in _ENTITY_NODES_CACHE:
        return _ENTITY_NODES_CACHE[key]
    rows = [
        (node_key_py("Instance", alias, "entities", line), "Instance", alias,
         "entities", line, eid, cls, "")
        for eid, line, alias, cls in E.instances()
    ]
    lit = spark.createDataFrame(
        rows,
        "node_key STRING, node_type STRING, name STRING, file STRING, "
        "start INT, entity_id INT, data_type STRING, meta STRING",
    )
    _ENTITY_NODES_CACHE[key] = lit
    return lit


def static_edges(spark: SparkSession) -> DataFrame:
    """Dictionary-derived edge families, computed on the driver
    (static data -> one LocalRelation, zero Spark jobs):

      OF         Instance -> its Class (mod.rs:168-174)
      PARENT_OF  parent Class -> child Class (array_graph.rs:229-246)
      IMPORTS    including Class -> included Class (array_graph.rs:247-266)
      OPERAND    Class/Trait -> Function entity (mod.rs:197-203)
      IMPLEMENTS Class -> Trait (collect.rs:60-81)
    """
    key = (spark.sparkContext.applicationId, "sedges")
    if key in _ENTITY_NODES_CACHE:
        return _ENTITY_NODES_CACHE[key]
    types = {i: t for i, _, t in E.ENTITIES}
    names = {i: n for i, n, _ in E.ENTITIES}

    def ekey(i: int) -> str:
        return node_key_py(types[i], names[i], "entities", i)

    rows: list[tuple[str, str, str]] = []
    for eid, line, alias, _cls in E.instances():
        rows.append(("OF", node_key_py("Instance", alias, "entities", line), ekey(eid)))
    for parent, child in E.PARENT_OF_PAIRS:
        rows.append(("PARENT_OF", ekey(parent), ekey(child)))
    for src, dst in E.CLASS_IMPORTS_PAIRS:
        rows.append(("IMPORTS", ekey(src), ekey(dst)))
    for src, dst in E.OPERAND_PAIRS:
        rows.append(("OPERAND", ekey(src), ekey(dst)))
    for src, dst in E.IMPLEMENTS_PAIRS:
        rows.append(("IMPLEMENTS", ekey(src), ekey(dst)))
    lit = spark.createDataFrame(
        rows, "edge_type STRING, source_key STRING, target_key STRING"
    )
    _ENTITY_NODES_CACHE[key] = lit
    return lit


# ---------------------------------------------------------------------------
# Nodes — split into bucket-pure (local) and cross-conversation
# (global) families so the resumable builder (streaming/incremental)
# composes the SAME code per unit: a bucket's output is a pure
# function of the bucket's rows + static dims; everything that
# consults global state (first_def, request ordering, role/bucket
# strata) lives in the globals unit, whose fingerprint covers the
# whole corpus. That decomposition is what makes bucket-wise resume
# byte-equal to the single-shot build under ANY edit (including one
# that moves a cross-bucket pick like the first defining turn).
# ---------------------------------------------------------------------------

_ROLLED = (
    "array_join(transform(array_sort(collect_list(struct(turn_idx, text))), "
    "x -> x.text), chr(10))"
)


def _pad(body="''", docs=NULL_S, hash_=NULL_S, data_type=NULL_S, meta="''"):
    return [
        f"{body} AS body",
        f"{docs} AS docs",
        f"{hash_} AS hash",
        f"{data_type} AS data_type",
        f"{meta} AS meta",
    ]


def local_nodes(spark: SparkSession, transcripts: DataFrame, requests: DataFrame) -> DataFrame:
    """File / Import / Function / Request nodes — pure functions of
    the conversation's own rows (embarrassingly parallel over conv_id
    buckets)."""
    # File body = ordered rollup of turn texts, guarded at
    # MAX_FILE_SIZE (builder/utils.rs:9: body dropped, node kept);
    # hash = digest of the (post-guard) body (prepare_file_data,
    # builder/utils.rs:90-101). groupBy(conv_id) reuses the conv_id
    # hash partitioning the derivation already produced — no shuffle.
    convs = (
        transcripts.groupBy("conv_id")
        .agg(
            F.expr("max(turn_idx)").alias("fend"),
            F.expr(_ROLLED).alias("raw_body"),
        )
        .selectExpr(
            "conv_id",
            "fend",
            f"CASE WHEN length(raw_body) > {MAX_FILE_SIZE} THEN '' ELSE raw_body END AS fbody",
        )
        .selectExpr(
            f"{_conv_key_sql('conv_id')} AS node_key",
            "'File' AS node_type",
            "conv_id AS name",
            "'corpus/' || conv_id AS file",
            "0 AS start",
            "fend AS `end`",
            *_pad(body="fbody", hash_="md5(fbody)", meta=f"'parent=' || {BUCKET_SQL}"),
        )
    )

    # Import = per-conversation rollup of the system-turn section
    # (combine_import_sections analog, builder/utils.rs:39-87: sort
    # by start, join with newlines).
    imports = (
        transcripts.where("role = 'system'")
        .groupBy("conv_id")
        .agg(
            F.expr("CAST(min(turn_idx) AS INT)").alias("istart"),
            F.expr("CAST(max(turn_idx) AS INT)").alias("iend"),
            F.expr(_ROLLED).alias("ibody"),
        )
        .selectExpr(
            f"{_import_key_sql('conv_id', 'istart')} AS node_key",
            "'Import' AS node_type",
            "'imports' AS name",
            "'corpus/' || conv_id AS file",
            "istart AS start",
            "iend AS `end`",
            *_pad(body="ibody", hash_="md5(ibody)", meta="'parent=' || conv_id"),
        )
    )

    # Turn docs = nearest preceding system-turn text
    # (attach_function_comments analog, lang/mod.rs:53-97) — a
    # conv_id-partitioned window, shuffle-free over the derivation's
    # partitioning.
    turns = transcripts.selectExpr(
        f"{_turn_key_sql('conv_id', 'turn_idx')} AS node_key",
        "'Function' AS node_type",
        "'turn_' || CAST(turn_idx AS STRING) AS name",
        "'corpus/' || conv_id AS file",
        "turn_idx AS start",
        "turn_idx AS `end`",
        "text AS body",
        "last(CASE WHEN role = 'system' THEN text END, true) OVER ("
        "PARTITION BY conv_id ORDER BY turn_idx "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS docs",
        "md5(text) AS hash",
        f"{NULL_S} AS data_type",
        "'parent=' || conv_id || ';role=' || role || "
        "CASE WHEN tool != '' THEN ';tool=' || tool ELSE '' END AS meta",
    )

    # Request NODES are one per distinct (conv, turn, verb, path):
    # a turn containing the same 'VERB path' string twice must yield
    # one node (its node_key is the same) — per-family dedup before
    # the wide key strings, same invariant as build_edges.
    reqs = requests.select("conv_id", "turn_idx", "verb", "path").distinct().selectExpr(
        f"{_request_key_sql('conv_id', 'turn_idx')} AS node_key",
        "'Request' AS node_type",
        "path AS name",
        "'corpus/' || conv_id AS file",
        "turn_idx AS start",
        "turn_idx AS `end`",
        *_pad(
            body="verb || ' ' || path",
            hash_="md5(verb || ' ' || path)",
            meta="'parent=turn_' || CAST(turn_idx AS STRING) || ';verb=' || verb",
        ),
    )

    return convs.unionByName(imports).unionByName(turns).unionByName(reqs)


def global_nodes(
    spark: SparkSession,
    transcripts: DataFrame,
    ent_nodes: DataFrame,
    first_def: DataFrame,
    pack: dict | None = None,
) -> DataFrame:
    """Repository / Language / Directory / Test / entity / Instance
    nodes — derived from corpus-wide state (role strata, bucket list,
    globally-first test definitions) or from the static dictionary."""
    repo = spark.sql(
        f"SELECT '{REPO_KEY}' AS node_key, 'Repository' AS node_type, "
        "'corpus' AS name, 'corpus' AS file, 0 AS start, 0 AS `end`, "
        "'' AS body, CAST(NULL AS STRING) AS docs, CAST(NULL AS STRING) AS hash, "
        "CAST(NULL AS STRING) AS data_type, '' AS meta"
    )

    langs = (
        transcripts.select("role").distinct().selectExpr(
            f"{_lang_key_sql('role')} AS node_key",
            "'Language' AS node_type",
            "role AS name",
            "'corpus' AS file",
            "0 AS start",
            "0 AS `end`",
            *_pad(meta="'parent=corpus'"),
        )
    )

    dirs = (
        transcripts.selectExpr(f"{BUCKET_SQL} AS bucket").distinct().selectExpr(
            f"{_dir_key_sql('bucket')} AS node_key",
            "'Directory' AS node_type",
            "bucket AS name",
            "'corpus/' || bucket AS file",
            "0 AS start",
            "0 AS `end`",
            *_pad(meta="'parent=corpus'"),
        )
    )

    tests = first_def.selectExpr(
        f"{_test_key_sql('tid', 'd_conv', 'd_turn', pack)} AS node_key",
        f"{_test_type_expr('tid', pack)} AS node_type",
        "'test_' || tid AS name",
        "'corpus/' || d_conv AS file",
        "d_turn AS start",
        "d_turn AS `end`",
        *_pad(
            body="d_text",
            hash_="md5(d_text)",
            meta=f"'parent=' || d_conv || ';test_kind=' || {_test_kind_expr('tid', pack)}",
        ),
    )

    ents = ent_nodes.selectExpr(
        "node_key", "node_type", "name", "file", "start", "start AS `end`",
        "'' AS body", f"{NULL_S} AS docs", f"{NULL_S} AS hash", "data_type", "meta",
    )
    insts = instance_nodes(spark).selectExpr(
        "node_key", "node_type", "name", "file", "start", "start AS `end`",
        "'' AS body", f"{NULL_S} AS docs", f"{NULL_S} AS hash", "data_type", "meta",
    )

    # Extracted Var nodes — one per (Directory bucket, var name) at
    # its bucket-FIRST declaring turn (collect.get_vars analog;
    # cross-conversation pick => a globals family).
    from .collect import bucket_first_var_defs

    var_nodes = bucket_first_var_defs(transcripts).selectExpr(
        f"{_var_key_sql('vname', 'd_conv', 'd_turn')} AS node_key",
        "'Var' AS node_type",
        "vname AS name",
        "'corpus/' || d_conv AS file",
        "d_turn AS start",
        "d_turn AS `end`",
        *_pad(meta="'parent=' || d_conv"),
    )

    return (
        repo.unionByName(langs)
        .unionByName(dirs)
        .unionByName(tests)
        .unionByName(ents)
        .unionByName(insts)
        .unionByName(var_nodes)
    )


def build_nodes(
    spark: SparkSession,
    transcripts: DataFrame,
    ent_nodes: DataFrame,
    first_def: DataFrame,
    requests: DataFrame,
    pack: dict | None = None,
) -> DataFrame:
    return local_nodes(spark, transcripts, requests).unionByName(
        global_nodes(spark, transcripts, ent_nodes, first_def, pack)
    )


# ---------------------------------------------------------------------------
# Edges
# ---------------------------------------------------------------------------

def _edge(df: DataFrame, edge_type: str, src: str, dst: str) -> DataFrame:
    return df.selectExpr(
        f"'{edge_type}' AS edge_type", f"{src} AS source_key", f"{dst} AS target_key"
    )


def req_matched(requests: DataFrame, ent_nodes: DataFrame) -> DataFrame:
    """Requests joined to their Endpoint entity with the GENERAL
    link_api_nodes join — a (verb, n_segments) equi-join carrying the
    segment-wise paths_match residual (linker.rs:129-163, 241-266),
    the same shape relink_api_nodes applies over graph-resident
    nodes. No corpus-specific path pattern: an endpoint template like
    '/api/{id}/orders' would link here without code changes. The
    endpoint dim stays broadcast; the residual only evaluates on the
    few rows sharing (verb, segment count). Shared by
    CALLS(Request->Endpoint) and HANDLER."""
    from ..functions.paths import n_segments_sql, paths_match_sql

    spark = requests.sparkSession
    en = ent_nodes.select(F.col("start").alias("eid"), "node_key")
    eps = E.endpoints_df(spark).selectExpr(
        "entity_id",
        "verb AS ep_verb",
        "'/api/' || seg || '/:param' AS epath",
    ).selectExpr(
        "entity_id", "ep_verb", "epath",
        f"{n_segments_sql('epath', 'spark')} AS ep_nseg",
    )
    reqs = requests.selectExpr(
        "conv_id", "turn_idx", "verb", "path", "norm_path",
        f"{n_segments_sql('norm_path', 'spark')} AS r_nseg",
    )
    cond = (
        (reqs["verb"] == eps["ep_verb"])
        & (reqs["r_nseg"] == eps["ep_nseg"])
        & F.expr(paths_match_sql("norm_path", "epath", "spark"))
    )
    return (
        reqs.join(F.broadcast(eps), cond)
        .drop("ep_verb", "r_nseg", "ep_nseg", "epath")
        .join(F.broadcast(en), F.col("entity_id") == F.col("eid"))
    )


def local_edges(
    spark: SparkSession,
    transcripts: DataFrame,
    resolved: DataFrame,
    ent_nodes: DataFrame,
    requests: DataFrame,
    matched: DataFrame | None = None,
) -> DataFrame:
    """Bucket-pure edge families: every row is a function of one
    conversation's rows + static dims."""
    en = ent_nodes.select(F.col("start").alias("eid"), "node_key", "canon_id")
    en_b = F.broadcast(en)
    if matched is None:
        matched = req_matched(requests, ent_nodes)

    convs = transcripts.select("conv_id").distinct()
    contains_conv = _edge(
        convs.selectExpr("conv_id", f"{BUCKET_SQL} AS bucket"),
        "CONTAINS", _dir_key_sql("bucket"), _conv_key_sql("conv_id"),
    )
    contains_turn = _edge(
        transcripts, "CONTAINS", _conv_key_sql("conv_id"), _turn_key_sql("conv_id", "turn_idx")
    )
    import_convs = (
        transcripts.where("role = 'system'")
        .groupBy("conv_id")
        .agg(F.expr("CAST(min(turn_idx) AS INT)").alias("istart"))
    )
    contains_import = _edge(
        import_convs, "CONTAINS", _conv_key_sql("conv_id"), _import_key_sql("conv_id", "istart")
    )
    contains_request = _edge(
        requests.select("conv_id", "turn_idx", "verb", "path").distinct(),
        "CONTAINS", _turn_key_sql("conv_id", "turn_idx"),
        _request_key_sql("conv_id", "turn_idx"),
    )

    # USES: resolved mention -> canonical entity node. Two broadcast
    # hops: entity -> canon_id -> canonical entity's node_key. Dedup
    # happens HERE on the narrow (conv_id, turn_idx, canon_key)
    # columns — a distinct whose ClusteredDistribution is satisfied
    # by the conv_id hash partitioning the transcripts already carry,
    # i.e. map-side only, no shuffle — and BEFORE the wide node_key
    # strings are materialized.
    canon_key = F.broadcast(
        en.select(F.col("eid").alias("canon_id"), F.col("node_key").alias("canon_key"))
    )
    # Mention-USES plus candidate-USES: per-turn CamelCase identifier
    # candidates (collect.rs:40-59 — dictionary-free extraction)
    # typed by exact canonical-name match cover identifiers written
    # by canonical name, which the case-sensitive alias path
    # deliberately rejects. Both routes land in ONE family with one
    # narrow distinct.
    from .collect import typed_entity_candidates

    mention_pairs = resolved.join(en_b, resolved["entity_id"] == en["eid"]).select(
        "conv_id", "turn_idx", "canon_id"
    )
    cand_pairs = (
        typed_entity_candidates(transcripts, E.entities_df(spark))
        .join(en_b, F.col("entity_id") == en["eid"])
        .select("conv_id", "turn_idx", "canon_id")
    )
    uses = _edge(
        mention_pairs.unionByName(cand_pairs)
        .join(canon_key, "canon_id")
        .select("conv_id", "turn_idx", "canon_key")
        .distinct(),
        "USES", _turn_key_sql("conv_id", "turn_idx"), "canon_key",
    )

    tools = F.broadcast(E.tools_df(spark))
    calls_tool = _edge(
        X.extract_tool_calls(transcripts)
        .join(tools, F.col("toolname") == tools["canonical_name"])
        .join(en_b, F.col("entity_id") == en["eid"])
        .select("conv_id", "turn_idx", "node_key")
        .distinct(),
        "CALLS", _turn_key_sql("conv_id", "turn_idx"), "node_key",
    )

    calls_ep = _edge(
        matched.select("conv_id", "turn_idx", "verb", "path", "node_key").distinct(),
        "CALLS", _request_key_sql("conv_id", "turn_idx"), "node_key",
    )

    # ARG_OF: tool turn -> entity passed as the call argument
    # (mod.rs:78). The (conv_id, turn_idx) join against the resolved
    # mentions is co-partitioned by conv_id — no extra shuffle.
    tool_turns = transcripts.where("tool != ''").select("conv_id", "turn_idx")
    arg_of = _edge(
        resolved.join(tool_turns, ["conv_id", "turn_idx"])
        .join(en_b, resolved["entity_id"] == en["eid"])
        .select("conv_id", "turn_idx", "node_key")
        .distinct(),
        "ARG_OF", _turn_key_sql("conv_id", "turn_idx"), "node_key",
    )

    # IMPORTS: conv File -> entities mentioned in turn 0 (the
    # top-of-file import section analog, file_imports mod.rs:218-224)
    imports_dyn = _edge(
        resolved.where(F.col("turn_idx") == 0)
        .join(en_b, resolved["entity_id"] == en["eid"])
        .select("conv_id", "node_key")
        .distinct(),
        "IMPORTS", _conv_key_sql("conv_id"), "node_key",
    )

    # INCLUDES: Feature -> mentioning turn; RENDERS: Page ->
    # mentioning turn (link_e2e_tests_pages analog, linker.rs:30-48)
    def _typed_mention_edges(etype: str, node_type: str) -> DataFrame:
        dim = F.broadcast(
            ent_nodes.where(F.col("node_type") == node_type)
            .select(F.col("start").alias("teid"), F.col("node_key").alias("src_key"))
        )
        return _edge(
            resolved.join(dim, resolved["entity_id"] == F.col("teid"))
            .select("conv_id", "turn_idx", "src_key")
            .distinct(),
            etype, "src_key", _turn_key_sql("conv_id", "turn_idx"),
        )

    includes = _typed_mention_edges("INCLUDES", "Feature")
    renders = _typed_mention_edges("RENDERS", "Page")

    # CONTAINS(Function turn -> dictionary Var) under the var-usage
    # tier cascade (format.rs:561-617; only the 'imported' tier can
    # accept for dictionary-resident vars — see collect.py) and
    # CONTAINS(Function turn -> Datamodel) from return-section type
    # identifiers (format.rs:621-644). Both are pure functions of the
    # conversation's own rows + static dims => bucket-local.
    from .collect import return_type_datamodels, var_usage_edges_dictionary

    var_dict = _edge(
        var_usage_edges_dictionary(resolved, ent_nodes),
        "CONTAINS", _turn_key_sql("conv_id", "turn_idx"), "var_key",
    )
    ret_dm = _edge(
        return_type_datamodels(transcripts, ent_nodes),
        "CONTAINS", _turn_key_sql("conv_id", "turn_idx"), "dm_key",
    )

    return (
        contains_conv.unionByName(contains_turn)
        .unionByName(contains_import)
        .unionByName(contains_request)
        .unionByName(uses)
        .unionByName(calls_tool)
        .unionByName(calls_ep)
        .unionByName(arg_of)
        .unionByName(imports_dyn)
        .unionByName(includes)
        .unionByName(renders)
        .unionByName(var_dict)
        .unionByName(ret_dm)
    )


def global_edges(
    spark: SparkSession,
    transcripts: DataFrame,
    ent_nodes: DataFrame,
    first_def: DataFrame,
    matched: DataFrame,
    pack: dict | None = None,
) -> DataFrame:
    """Cross-conversation edge families: scaffolding of the global
    strata, test linking (depends on the corpus-wide first_def pick),
    HANDLER (corpus-wide first request per endpoint), canonical-OF
    and the static dictionary families."""
    contains_lang = _edge(
        transcripts.select("role").distinct(),
        "CONTAINS", f"'{REPO_KEY}'", _lang_key_sql("role"),
    )
    buckets = transcripts.selectExpr(f"{BUCKET_SQL} AS bucket").distinct()
    contains_dir = _edge(buckets, "CONTAINS", f"'{REPO_KEY}'", _dir_key_sql("bucket"))
    contains_test = _edge(
        first_def, "CONTAINS", _conv_key_sql("d_conv"),
        _test_key_sql("tid", "d_conv", "d_turn", pack),
    )

    # CALLS: Test -> referencing turn (shared-test-id link,
    # linker.rs:56-127; Test covers the Functions that reference it)
    calls_test = _edge(
        X.extract_test_refs(transcripts)
        .join(F.broadcast(first_def.select("tid", "d_conv", "d_turn")), "tid")
        .select("conv_id", "turn_idx", "tid", "d_conv", "d_turn")
        .distinct(),
        "CALLS", _test_key_sql("tid", "d_conv", "d_turn", pack),
        _turn_key_sql("conv_id", "turn_idx"),
    )

    # HANDLER: endpoint -> globally-first referencing turn (or -last,
    # when a dialect pack's handler_pick says so — mod.rs:208-223 as
    # data, live in the build). A window over the 5 endpoint keys
    # would cap this stage at 5 concurrent tasks (a hard scaling
    # ceiling on the whole build); the struct-min/max aggregate gets
    # map-side combine instead — the shuffle carries one candidate
    # per (endpoint, partition).
    agg = "min" if (pack or {}).get("handler_pick", "first") == "first" else "max"
    handler = _edge(
        matched.groupBy("entity_id", "node_key")
        .agg(F.expr(f"{agg}(struct(conv_id, turn_idx)) AS f"))
        .selectExpr("node_key", "f.conv_id AS conv_id", "f.turn_idx AS turn_idx"),
        "HANDLER", "node_key", _turn_key_sql("conv_id", "turn_idx"),
    )

    # OF: alias-member entity -> canonical entity (the
    # canonicalization collapse; add_instances analog)
    canon_key = F.broadcast(
        ent_nodes.selectExpr("start AS canon_id", "node_key AS canon_key")
    )
    of_canon = _edge(
        ent_nodes.where(F.col("canon_id") != F.col("start")).join(canon_key, "canon_id"),
        "OF", "node_key", "canon_key",
    )

    # Extracted Var scaffold + tiered usage (collect.py): the Var
    # node's defining site is a bucket-FIRST pick (cross-conv) =>
    # globals families, like first_def.
    from .collect import bucket_first_var_defs, var_usage_edges_extracted

    contains_var = _edge(
        bucket_first_var_defs(transcripts),
        "CONTAINS", _conv_key_sql("d_conv"), _var_key_sql("vname", "d_conv", "d_turn"),
    )
    var_extracted = _edge(
        var_usage_edges_extracted(transcripts),
        "CONTAINS", _turn_key_sql("conv_id", "turn_idx"),
        _var_key_sql("vname", "d_conv", "d_turn"),
    )

    return (
        contains_lang.unionByName(contains_dir)
        .unionByName(contains_test)
        .unionByName(calls_test)
        .unionByName(handler)
        .unionByName(of_canon)
        .unionByName(contains_var)
        .unionByName(var_extracted)
        .unionByName(static_edges(spark))
    )


def build_edges(
    spark: SparkSession,
    transcripts: DataFrame,
    resolved: DataFrame,
    ent_nodes: DataFrame,
    first_def: DataFrame,
    requests: DataFrame,
    pack: dict | None = None,
) -> DataFrame:
    """All 12 edge families, deduped on (edge_type, source_key,
    target_key) PER FAMILY on narrow conv_id-prefixed columns —
    map-side only under the conv_id partitioning, before wide key
    strings exist. Families cannot collide across the union:
    CONTAINS sub-families target disjoint node-type key spaces; the
    three CALLS families have disjoint source spaces (Function turns
    / Request keys / Test keys); OF splits into entity->entity and
    instance->entity; IMPORTS into File->entity and Class->Class;
    the rest are unique by construction. So no global dropDuplicates
    — at 10^12 turns that global shuffle of every edge was the
    single largest cost of the build (test_edge_dedup_invariant
    proves the invariant)."""
    # consumed by both calls_ep (local) and handler (global): persist
    # so the request-extraction scan runs once per action.
    matched = req_matched(requests, ent_nodes).persist()
    return local_edges(spark, transcripts, resolved, ent_nodes, requests, matched).unionByName(
        global_edges(spark, transcripts, ent_nodes, first_def, matched, pack)
    )


def triples(edges: DataFrame) -> DataFrame:
    """The P/R-gated view: (subj, pred, obj)."""
    return edges.select(
        F.col("source_key").alias("subj"),
        F.col("edge_type").alias("pred"),
        F.col("target_key").alias("obj"),
    )


def uses_by_entity(resolved: DataFrame, ent_nodes: DataFrame) -> DataFrame:
    """USES count per canonical entity — the skew-facing aggregate.

    Two-phase: pre-aggregate per (conv_id, entity) — co-partitioned
    with the mention stream, so the hot entity contributes one row
    per conversation, not one per mention — then final rollup.
    """
    per_conv = resolved.groupBy("conv_id", "entity_id").agg(F.count("*").alias("n"))
    en = F.broadcast(ent_nodes.select(F.col("start").alias("entity_id"), "canon_id"))
    names = F.broadcast(
        ent_nodes.select(F.col("start").alias("canon_id"), F.col("name").alias("canonical_name"))
    )
    return (
        per_conv.join(en, "entity_id")
        .groupBy("canon_id")
        .agg(F.sum("n").cast("bigint").alias("n_uses"))
        .join(names, "canon_id")
        .select(F.col("canon_id"), F.col("canonical_name"), F.col("n_uses"))
    )
