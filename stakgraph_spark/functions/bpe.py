"""Vendored byte-level BPE tokenizer (deterministic, dependency-free).

The reference stamps every uploaded node with a tiktoken (gpt-4 /
cl100k_base) token count (`ast/src/lang/graphs/neo4j_utils.rs:13-15,
74-75`). tiktoken and its 100k-merge vocab are not available in this
container, so this module ships the same *mechanism* — greedy
byte-pair-encoding over regex pre-tokens, exactly tiktoken's
algorithm — with a small merge table trained deterministically at
import time from an embedded seed corpus. It is a real, lossless
tokenizer (decode(encode(x)) == x for every unicode string), not the
whitespace proxy `operators/textstats.token_count` keeps for the
JVM-side fast path; swap `SEED_TEXT`/`N_MERGES` for a production
vocab when one can be vendored.

Scale shape: `token_count_bpe` runs as an Arrow-batched pandas UDF —
the same declared python-boundary as the reference's tiktoken call
(per-body CPU either way); ranks are built once per executor
interpreter, not per batch.
"""

from __future__ import annotations

import re
from functools import lru_cache

# GPT-2-style pre-tokenizer: contractions, letter runs, digit runs,
# punctuation runs (each optionally space-prefixed), then whitespace.
_PRETOK = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)

# Deterministic seed corpus: representative of the transcript domain
# (prose + code identifiers + paths + JSON). Training is a pure
# function of (SEED_TEXT, N_MERGES) — same merges on every machine.
SEED_TEXT = (
    "the user asked the assistant to update the endpoint handler and "
    "return the payment status for the order service. the assistant "
    "defined a function called get_payment_status in payments/api.py "
    "and added a test that calls GET /api/payments/:id with a valid "
    "token. the class PaymentService implements the RetryPolicy trait "
    "and imports the database model from models/payment.py. "
    '{"role": "assistant", "content": "let me check the request "} '
    "for item in items: total += item.price * item.quantity "
    "def handle_request(self, request): return self.router.dispatch "
    "SELECT order_id, sum(amount) FROM payments GROUP BY order_id "
    "the integration test asserts that the response status is 200 "
    "and the body contains the expected customer name and address. "
    "import numpy as np; from pyspark.sql import functions as F "
    "error: connection refused at line 42 of server/main.go "
    "la respuesta del servidor contiene el estado del pago "
    "async fn resolve_endpoint(path: &str) -> Result<Handler> "
) * 2

N_MERGES = 384


def train_bpe(seed_text: str = SEED_TEXT, n_merges: int = N_MERGES) -> dict[tuple[bytes, bytes], int]:
    """Classic BPE training: start from raw bytes, repeatedly merge
    the most frequent adjacent token pair (ties broken by the
    lexicographically smallest pair — fully deterministic). Returns
    {(left_bytes, right_bytes): rank}."""
    # word -> frequency over pre-tokens; each word is a tuple of byte-tokens
    freqs: dict[tuple[bytes, ...], int] = {}
    for tok in _PRETOK.findall(seed_text):
        w = tuple(bytes([b]) for b in tok.encode("utf-8"))
        if w:
            freqs[w] = freqs.get(w, 0) + 1
    ranks: dict[tuple[bytes, bytes], int] = {}
    for rank in range(n_merges):
        pair_counts: dict[tuple[bytes, bytes], int] = {}
        for w, f in freqs.items():
            for i in range(len(w) - 1):
                p = (w[i], w[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + f
        if not pair_counts:
            break
        # highest count; ties broken by lexicographically smallest
        # (left, right) pair — fully deterministic
        pair = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        ranks[pair] = rank
        merged = pair[0] + pair[1]
        new_freqs: dict[tuple[bytes, ...], int] = {}
        for w, f in freqs.items():
            out = []
            i = 0
            while i < len(w):
                if i < len(w) - 1 and w[i] == pair[0] and w[i + 1] == pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            nw = tuple(out)
            new_freqs[nw] = new_freqs.get(nw, 0) + f
        freqs = new_freqs
    return ranks


@lru_cache(maxsize=1)
def _default_ranks() -> dict[tuple[bytes, bytes], int]:
    return train_bpe()


def _encode_word(word: bytes, ranks: dict[tuple[bytes, bytes], int]) -> list[bytes]:
    """tiktoken-style greedy apply: repeatedly merge the adjacent
    pair with the LOWEST training rank until none is mergeable."""
    parts = [bytes([b]) for b in word]
    while len(parts) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return parts


def bpe_encode(text: str, ranks: dict[tuple[bytes, bytes], int] | None = None) -> list[bytes]:
    """Encode a unicode string into BPE tokens (as byte strings).
    Lossless: b''.join(bpe_encode(x)) == x.encode('utf-8')."""
    if ranks is None:
        ranks = _default_ranks()
    out: list[bytes] = []
    for tok in _PRETOK.findall(text):
        out.extend(_encode_word(tok.encode("utf-8"), ranks))
    return out


def bpe_decode(tokens: list[bytes]) -> str:
    return b"".join(tokens).decode("utf-8")


def bpe_count(text: str, ranks: dict[tuple[bytes, bytes], int] | None = None) -> int:
    return len(bpe_encode(text, ranks))


def token_count_bpe_udf():
    """Arrow-batched pandas UDF: real BPE token count per text value.
    The declared python boundary (same shape as the reference's
    per-body tiktoken call); NULL-safe (NULL -> NULL)."""
    import pandas as pd  # noqa: F401 — type-hint resolution needs it in scope
    from pyspark.sql.functions import pandas_udf

    def _count(s):
        ranks = _default_ranks()
        return s.map(lambda t: None if t is None else bpe_count(t, ranks))

    # annotate via __annotations__ with REAL classes (a local
    # `import pandas` inside this factory is invisible to the string-
    # annotation resolver pandas_udf uses)
    _count.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_count, "bigint")


def token_count_bpe(documents, text_col: str = "text", id_col: str = "doc_id"):
    """-> (id_col, bpe_real_tokens): per-document real-BPE token
    count. Plumbing mirrors `textstats.token_count`; this is the
    slow-path twin that uses the vendored tokenizer instead of the
    regex proxy."""
    f = token_count_bpe_udf()
    return documents.select(id_col, f(documents[text_col]).alias("bpe_real_tokens"))
