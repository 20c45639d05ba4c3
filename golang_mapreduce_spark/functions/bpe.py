"""Byte-pair encoding over the fixture corpus's closed vocabulary.

Real tokenizers ship a frozen merge table; applying one at 100 TB is a
broadcast of that table (as a pandas-UDF tokenizer for open text, or —
when the vocabulary is closed, as here — a precomputed word→token-count
map evaluated entirely JVM-side).  This module trains a standard
character BPE (greedy most-frequent-pair, deterministic tie-break) on
the corpus vocabulary at import time and exposes the per-word token
counts both engines share.

The training corpus is the documents fixture's full vocabulary (31
words, identical at every scale factor — fixture property pinned in
tests/test_bpe.py).
"""

from __future__ import annotations

from collections import Counter

#: The closed vocabulary of the documents fixture (all SFs).
VOCAB = (
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
)

N_MERGES = 40


def train_merges(words: tuple[str, ...], n_merges: int) -> list[tuple[str, str]]:
    """Standard BPE training (unit word frequency): repeatedly merge the
    most frequent adjacent symbol pair.  Ties break on the
    lexicographically greatest pair — any fixed rule works, it only has
    to be deterministic across runs."""
    seqs: dict[str, list[str]] = {w: list(w) for w in words}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for seq in seqs.values():
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += 1
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w, seq in seqs.items():
            out: list[str] = []
            i = 0
            while i < len(seq):
                if i < len(seq) - 1 and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
    return merges


def apply_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply a frozen merge list in training order (standard BPE apply)."""
    seq = list(word)
    for a, b in merges:
        out: list[str] = []
        i = 0
        while i < len(seq):
            if i < len(seq) - 1 and seq[i] == a and seq[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


MERGES = train_merges(VOCAB, N_MERGES)

#: word -> BPE token count, the shared map both engines evaluate.
BPE_COUNTS = {w: len(apply_merges(w, MERGES)) for w in VOCAB}


#: BPE-dropout (Provilkov et al., ACL 2020) skip rate, percent.
DROPOUT_PCT = 15


def _drop(word: str, merge_idx: int, pos: int, pct: int) -> bool:
    """Deterministic per-site dropout decision: md5 of the
    (word, merge index, position) triple — the same digest family the
    engine-shared hash32 uses, frozen here at import so both engines see
    one table, not a hash implementation."""
    import hashlib

    h = int(hashlib.md5(f"{word}:{merge_idx}:{pos}".encode()).hexdigest()[:8], 16)
    return h % 100 < pct


def apply_merges_dropout(
    word: str, merges: list[tuple[str, str]], pct: int = DROPOUT_PCT
) -> list[str]:
    """BPE-dropout apply: identical to apply_merges except each merge
    SITE is skipped with deterministic pseudo-probability pct/100 —
    subword regularization, the stochastic-segmentation trick that makes
    a model robust to tokenization ambiguity, made reproducible."""
    seq = list(word)
    for m, (a, b) in enumerate(merges):
        out: list[str] = []
        i = 0
        while i < len(seq):
            if (
                i < len(seq) - 1
                and seq[i] == a
                and seq[i + 1] == b
                and not _drop(word, m, i, pct)
            ):
                out.append(a + b)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


#: word -> dropout-sampled token count (>= BPE_COUNTS[word] by
#: construction: skipping merges only fragments further).
BPE_DROPOUT_COUNTS = {
    w: len(apply_merges_dropout(w, MERGES)) for w in VOCAB
}
