"""Vendored byte-level BPE tokenizer (functions/bpe.py).

The reference counts tokens with tiktoken's gpt-4 BPE per node body
(ast/src/lang/graphs/neo4j_utils.rs:13-15,74-75); the vendored
tokenizer implements the same greedy byte-pair mechanism with a
deterministic embedded merge table. Correctness here is checked by
the tokenizer's own algebra (no circular re-implementation):
losslessness, determinism, compression, and Spark-vs-local equality
of the Arrow-batched UDF."""

from __future__ import annotations

import pytest

from stakgraph_spark.functions.bpe import (
    N_MERGES,
    bpe_count,
    bpe_decode,
    bpe_encode,
    token_count_bpe,
    train_bpe,
)

TRICKY = [
    "",
    "hello world",
    "the assistant defined get_payment_status in payments/api.py",
    "GET /api/payments/:id?verbose=1",
    '{"role": "user", "content": "naïve café — ☕️ 你好"}',
    "x = [i**2 for i in range(10)]  # comment",
    "\n\t  mixed   whitespace\r\n",
    "'s 't 're contractions don't",
    "ZZZ unseen\x00bytes\xff" + chr(0x10FFFF),
]


def test_roundtrip_lossless():
    for s in TRICKY:
        toks = bpe_encode(s)
        assert bpe_decode(toks) == s
        assert b"".join(toks) == s.encode("utf-8")


def test_training_deterministic():
    r1 = train_bpe()
    r2 = train_bpe()
    assert r1 == r2
    # training may exhaust the seed's pair inventory before N_MERGES
    assert 256 <= len(r1) <= N_MERGES
    # ranks are a permutation of 0..n-1 (one merge per round)
    assert sorted(r1.values()) == list(range(len(r1)))


def test_merges_compress_domain_text():
    s = "the assistant added a test that calls the payment endpoint"
    n_bytes = len(s.encode("utf-8"))
    n_toks = bpe_count(s)
    # a trained table must merge well below byte-level on seed-domain text
    assert 0 < n_toks < n_bytes / 2
    # and every non-empty string yields at least one token
    assert bpe_count("Q") == 1


def test_unseen_bytes_fall_back_to_byte_tokens():
    # characters absent from the seed still encode (base-256 alphabet)
    s = "\x07\x1b\xfe"
    assert bpe_decode(bpe_encode(s)) == s


def test_sink_stamping_with_bpe_tokenizer(spark):
    from stakgraph_spark.sources.sinks import prepare_upload_nodes

    df = spark.createDataFrame(
        [("k1", "the assistant added a test"), ("k2", "x")],
        "node_key string, body string",
    )
    rows = {
        r["node_key"]: r
        for r in prepare_upload_nodes(df, 1_700_000_000, tokenizer="bpe").collect()
    }
    assert rows["k1"]["token_count"] == bpe_count("the assistant added a test")
    assert rows["k2"]["token_count"] == 1
    assert rows["k1"]["date_added_to_graph"] == 1_700_000_000


def test_udf_matches_local(spark):
    rows = [(i, t) for i, t in enumerate(TRICKY)] + [(99, None)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r["bpe_real_tokens"] for r in token_count_bpe(df).collect()}
    for i, t in rows:
        assert got[i] == (None if t is None else bpe_count(t))
