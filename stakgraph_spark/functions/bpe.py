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
JVM-side fast path.

Pretrained vocabularies: `load_ranks(path)` reads BOTH published
on-disk formats — the GPT-2 / HuggingFace `merges.txt` (one merge
pair per line in GPT-2's byte→unicode mapped space; `vocab.json` is
not needed, the merge order IS the rank) and tiktoken's `.tiktoken`
base64 rank table (`<b64 token> <rank>` per line, the format of
`gpt2.tiktoken` / `cl100k_base.tiktoken`). Drop the published file
next to the job and pass `vocab_path=` (or
`prepare_upload_nodes(tokenizer="bpe", vocab_path=...)`) and token
counts reproduce the published tokenizer exactly for text its
pre-tokenizer splits like `GPT2_PRETOK` below (an `re`-module
rendering of GPT-2's published pattern; the single documented delta
is `\\p{N}`→`\\d`, which differs only on non-decimal number
characters like Ⅻ). No such file ships in this container — vendoring
one from memory would be fabrication — so the embedded seed table
remains the default; the loaders + format tests make the published
counts a file-drop away.

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


def bpe_encode(text: str, ranks=None, pattern: re.Pattern | None = None) -> list[bytes]:
    """Encode a unicode string into BPE tokens (as byte strings).
    Lossless: b''.join(bpe_encode(x)) == x.encode('utf-8').
    `ranks` is any pair→rank view (the trained dict, a loaded
    merges.txt dict, or a TokenTableRanks over a .tiktoken table)."""
    if ranks is None:
        ranks = _default_ranks()
    out: list[bytes] = []
    for tok in (pattern or _PRETOK).findall(text):
        out.extend(_encode_word(tok.encode("utf-8"), ranks))
    return out


def bpe_decode(tokens: list[bytes]) -> str:
    return b"".join(tokens).decode("utf-8")


def bpe_count(text: str, ranks=None, pattern: re.Pattern | None = None) -> int:
    return len(bpe_encode(text, ranks, pattern))


# --- published-vocab loaders ------------------------------------------------
#
# The reference's tokenizer is tiktoken with a pretrained 100k-merge
# vocab (neo4j_utils.rs:13-15). These loaders accept the two public
# serializations of such vocabs so a production deployment gets
# published-exact counts by pointing `vocab_path` at the real file.

# GPT-2's published pre-tokenizer pattern, rendered for the stdlib
# `re` module: \p{L} → [^\W\d_] (unicode letters under re.UNICODE),
# \p{N} → \d (decimal digits; the lone delta vs the published
# pattern — \p{N} also matches Nl/No like Ⅻ/①), punctuation runs =
# non-space-non-word plus underscore (GPT-2 groups '_' with
# punctuation because it is \w but not \p{L}/\p{N}).
GPT2_PRETOK = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+(?!\S)|\s+",
    re.UNICODE,
)


@lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's byte↔unicode bijection (encoder.py, public): the 188
    printable latin-1 bytes map to themselves, the other 68 map to
    U+0100+n so every byte has a visible, whitespace-free stand-in.
    merges.txt / vocab.json store tokens in this mapped space
    (space → 'Ġ', newline → 'Ċ')."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


def _mapped_to_bytes(s: str) -> bytes:
    inv = {c: b for b, c in bytes_to_unicode().items()}
    return bytes(inv[ch] for ch in s)


def _bytes_to_mapped(b: bytes) -> str:
    enc = bytes_to_unicode()
    return "".join(enc[x] for x in b)


def load_merges_txt(path: str) -> dict[tuple[bytes, bytes], int]:
    """GPT-2 / HuggingFace `merges.txt`: optional '#version' header,
    then one 'left right' merge per line in the byte→unicode mapped
    space; line order IS the rank. Returns the same pair→rank dict
    `train_bpe` produces, so the loaded vocab drops into every
    encode/count call unchanged."""
    ranks: dict[tuple[bytes, bytes], int] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#version"):
                continue
            left, right = line.split(" ")
            ranks[(_mapped_to_bytes(left), _mapped_to_bytes(right))] = len(ranks)
    return ranks


def save_merges_txt(ranks: dict[tuple[bytes, bytes], int], path: str) -> None:
    """Inverse of `load_merges_txt` (exact GPT-2 file format) — lets
    the vendored trained table round-trip through the published
    serialization, which is how the loader is tested without
    fabricating a 'real' vocab."""
    with open(path, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for (left, right), _ in sorted(ranks.items(), key=lambda kv: kv[1]):
            f.write(f"{_bytes_to_mapped(left)} {_bytes_to_mapped(right)}\n")


class TokenTableRanks:
    """Pair→rank view over a tiktoken-style token→rank table: the
    rank of merging (a, b) is the table's rank of the merged bytes
    a+b — exactly tiktoken's BPE step, so greedy lowest-rank merging
    over this view reproduces tiktoken's segmentation. Picklable
    (ships to executors in the UDF closure / broadcast)."""

    __slots__ = ("table",)

    def __init__(self, table: dict[bytes, int]):
        self.table = table

    def get(self, pair: tuple[bytes, bytes]):
        return self.table.get(pair[0] + pair[1])

    def __eq__(self, other):
        return isinstance(other, TokenTableRanks) and self.table == other.table

    def __getstate__(self):
        return self.table

    def __setstate__(self, table):
        self.table = table


def load_tiktoken(path: str) -> TokenTableRanks:
    """tiktoken's published rank-table format (`gpt2.tiktoken`,
    `cl100k_base.tiktoken`, ...): one '<base64 token> <rank>' per
    line, raw bytes base64-encoded."""
    import base64

    table: dict[bytes, int] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            tok_b64, rank = line.split(" ")
            table[base64.b64decode(tok_b64)] = int(rank)
    return TokenTableRanks(table)


def load_ranks(path: str):
    """Dispatch on the published file's extension: `.tiktoken` →
    base64 rank table, anything else → GPT-2 merges.txt."""
    return load_tiktoken(path) if path.endswith(".tiktoken") else load_merges_txt(path)


def token_count_bpe_udf(ranks=None, pattern: re.Pattern | None = None):
    """Arrow-batched pandas UDF: real BPE token count per text value.
    The declared python boundary (same shape as the reference's
    per-body tiktoken call); NULL-safe (NULL -> NULL).

    `ranks` may be a pair→rank dict, a TokenTableRanks, or a Spark
    Broadcast of either (a loaded 50k-merge vocab is ~MBs — ship it
    once per executor, not once per task). Default (None): the
    embedded seed table, rebuilt per executor interpreter via
    lru_cache, zero closure weight."""
    import pandas as pd  # noqa: F401 — type-hint resolution needs it in scope
    from pyspark.sql.functions import pandas_udf

    def _count(s):
        r = ranks
        if r is not None and hasattr(r, "value"):  # Broadcast
            r = r.value
        if r is None:
            r = _default_ranks()
        return s.map(lambda t: None if t is None else bpe_count(t, r, pattern))

    # annotate via __annotations__ with REAL classes (a local
    # `import pandas` inside this factory is invisible to the string-
    # annotation resolver pandas_udf uses)
    _count.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_count, "bigint")


def token_count_bpe(
    documents,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_path: str | None = None,
):
    """-> (id_col, bpe_real_tokens): per-document real-BPE token
    count. Plumbing mirrors `textstats.token_count`; this is the
    slow-path twin that uses the vendored tokenizer instead of the
    regex proxy. `vocab_path`: a published merges.txt / .tiktoken
    file — loaded once on the driver, broadcast to executors, and
    paired with the GPT-2 pre-tokenizer (published vocabs assume it)."""
    if vocab_path:
        bc = documents.sparkSession.sparkContext.broadcast(load_ranks(vocab_path))
        f = token_count_bpe_udf(bc, GPT2_PRETOK)
    else:
        f = token_count_bpe_udf()
    return documents.select(id_col, f(documents[text_col]).alias("bpe_real_tokens"))
