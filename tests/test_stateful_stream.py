"""Custom stateful streaming operator (applyInPandasWithState):
state accumulated across MULTIPLE micro-batches must equal the batch
computation over the full input — the streaming/batch equivalence
invariant for conversation-level accumulators."""

import os
import tempfile

import pyspark.sql.functions as F

from stakgraph_spark.sources.transcripts import read_transcripts
from stakgraph_spark.streaming.stream import (
    conversation_state_query,
    read_transcript_stream,
)
from tests.conftest import SF_SMALL


def test_conversation_state_matches_batch(spark):
    tr = read_transcripts(spark, SF_SMALL).persist()
    base = tempfile.mkdtemp(prefix="sg_state_")
    in_dir, out_dir, ckpt = (os.path.join(base, d) for d in ("in", "out", "ckpt"))

    # two file drops -> forced multi-batch (maxFilesPerTrigger=1), so
    # the state store genuinely carries state between batches
    tr.where("turn_idx % 2 = 0").write.mode("overwrite").parquet(os.path.join(in_dir, "drop1"))
    tr.where("turn_idx % 2 = 1").write.mode("overwrite").parquet(os.path.join(in_dir, "drop2"))

    stream = (
        spark.readStream.schema(
            "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING, ts TIMESTAMP"
        )
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = conversation_state_query(stream, out_dir, ckpt)
    # availableNow=True stops the stream once every pending file is
    # processed; a silent timeout here (busy host, full-suite load)
    # would surface as a confusing downstream equality failure, so
    # assert termination explicitly with a generous cap.
    assert q.awaitTermination(600), "stream did not drain available input in 600s"

    got_all = spark.read.parquet(out_dir)
    assert got_all.select("batch_id").distinct().count() >= 2  # multi-batch proven
    # latest state per conversation
    latest = (
        got_all.groupBy("conv_id")
        .agg(F.expr("max(struct(batch_id, n_turns, n_mentions, max_turn_idx)) AS s"))
        .selectExpr("conv_id", "s.n_turns AS n_turns", "s.n_mentions AS n_mentions",
                    "s.max_turn_idx AS max_turn_idx")
        .toPandas()
        .set_index("conv_id")
        .sort_index()
    )

    from stakgraph_spark.operators.extract import extract_mentions_raw

    m = extract_mentions_raw(tr).groupBy("conv_id").agg(F.count("*").alias("n_mentions"))
    want = (
        tr.groupBy("conv_id")
        .agg(F.count("*").alias("n_turns"), F.expr("max(turn_idx)").alias("max_turn_idx"))
        .join(m, "conv_id", "left")
        .fillna(0, subset=["n_mentions"])
        .toPandas()
        .set_index("conv_id")
        .sort_index()
    )
    cols = ["n_turns", "n_mentions", "max_turn_idx"]
    assert latest[cols].astype("int64").equals(want[cols].astype("int64"))
    tr.unpersist()
