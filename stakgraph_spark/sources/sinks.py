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


def write_graph_parquet(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """Columnar graph store: edges partitioned by edge_type (queries
    filter on it; partition pruning makes per-predicate scans free)."""
    nodes.write.mode("overwrite").parquet(os.path.join(out_dir, "nodes"))
    edges.write.mode("overwrite").partitionBy("edge_type").parquet(os.path.join(out_dir, "edges"))
