"""Graph sinks & ingestion.

  write_jsonl / read_jsonl   the reference output format the P/R
                             harness compares against: one JSON
                             object per node/edge line
                             (print_json, ast/src/utils.rs:13-47)
                             and the /upload ingestion path
                             (mcp/src/graph/uploads.ts:18-77)
  write_graph_parquet        columnar store layout (edge_type as a
                             write-partition column — the reference
                             groups edge batches by type,
                             neo4j_utils.rs:129-183)

At cluster scale the parquet writer becomes an Iceberg MERGE on
node_key (idempotent upsert — the Neo4j MERGE analog,
neo4j_utils.rs:79-86); the streaming/incremental module provides the
manifest/resume protocol on top.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_jsonl(nodes: DataFrame, edges: DataFrame, out_dir: str, name: str = "graph") -> None:
    """{name}-nodes.jsonl/ and {name}-edges.jsonl/ directories of
    line-delimited JSON (distributed write; a single file would
    serialize through one task)."""
    nodes.write.mode("overwrite").json(os.path.join(out_dir, f"{name}-nodes.jsonl"))
    edges.write.mode("overwrite").json(os.path.join(out_dir, f"{name}-edges.jsonl"))


def read_jsonl(spark: SparkSession, out_dir: str, name: str = "graph"):
    """Ingest a jsonl graph drop (uploads.ts analog). Dedup on read:
    uploaded drops may overlap already-ingested data."""
    nodes = spark.read.json(os.path.join(out_dir, f"{name}-nodes.jsonl")).dropDuplicates(
        ["node_key"]
    )
    edges = spark.read.json(os.path.join(out_dir, f"{name}-edges.jsonl")).dropDuplicates(
        ["edge_type", "source_key", "target_key"]
    )
    return nodes, edges


def prepare_upload_nodes(
    nodes: DataFrame,
    now_epoch: int,
    tokenizer: str = "proxy",
    vocab_path: str | None = None,
) -> DataFrame:
    """Upload-time property stamping (NodeQueryBuilder.build,
    neo4j_utils.rs:61-90): every node row gains

      ref_id                a per-upload node identifier. The
                            reference mints uuid4 (with a TEST_REF_ID
                            env escape hatch for determinism); here
                            the id is the uuid-FORMATTED md5 of
                            (node_key, now) — same shape and
                            uniqueness, but deterministic, which the
                            engine's parallelism-invariance and
                            resume byte-identity gates require.
      token_count           token count of the body
                            (calculate_token_count analog,
                            neo4j_utils.rs:74-75). tokenizer='proxy'
                            (default): whitespace count, a pure JVM
                            column expression — the fast path.
                            tokenizer='bpe': the vendored real BPE
                            (functions/bpe.py, lossless greedy
                            byte-pair encode via Arrow-batched pandas
                            UDF — the same python-boundary shape as
                            the reference's tiktoken call); pass
                            vocab_path= to a published merges.txt /
                            .tiktoken file for published-exact counts.
      date_added_to_graph   the upload timestamp (MERGE's $now).

    Pure column expressions (plus the optional BPE UDF); stamp at
    sink time, not build time, so the build output stays
    timestamp-free (resumable byte-identity).
    """
    h = f"md5(node_key || ':' || '{int(now_epoch)}')"
    ref_id = (
        f"concat_ws('-', substr({h},1,8), substr({h},9,4), substr({h},13,4), "
        f"substr({h},17,4), substr({h},21,12))"
    )
    if tokenizer == "bpe":
        from ..functions.bpe import GPT2_PRETOK, load_ranks, token_count_bpe_udf

        if vocab_path:
            # published merges.txt / .tiktoken vocab (bpe.load_ranks):
            # loaded once on the driver, broadcast, GPT-2 pre-tokenizer
            # (published vocabs assume it) — published-exact counts
            bc = nodes.sparkSession.sparkContext.broadcast(load_ranks(vocab_path))
            f = token_count_bpe_udf(bc, GPT2_PRETOK)
        else:
            f = token_count_bpe_udf()
        nodes = nodes.withColumn("token_count", f(nodes["body"]))
    else:
        nodes = nodes.selectExpr(
            "*", "CAST(size(split(trim(body), '\\\\s+')) AS BIGINT) AS token_count"
        )
    return nodes.selectExpr(
        "*",
        f"{ref_id} AS ref_id",
        f"CAST({int(now_epoch)} AS BIGINT) AS date_added_to_graph",
    )


def write_graph_parquet(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """Columnar graph store: edges partitioned by edge_type (queries
    filter on it; partition pruning makes per-predicate scans free)."""
    nodes.write.mode("overwrite").parquet(os.path.join(out_dir, "nodes"))
    edges.write.mode("overwrite").partitionBy("edge_type").parquet(os.path.join(out_dir, "edges"))
