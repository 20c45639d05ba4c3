"""Scale-up fixture generator for benchmarking beyond the shipped SFs.

The shipped testdata tops out at sf0.1, where every headline query
finishes in <4 s and fixed overhead hides plan differences (VERDICT r2
#6).  This derives an sf~1 volume by unioning k offset-keyed replicas of
the sf0.1 FACT tables (lineitem, orders, events, documents, embeddings)
while keeping the dimension tables as-is: primary keys are offset per
replica so uniqueness survives; foreign keys into dimensions are left
unchanged, so each dim key simply gains k× the fact rows — exactly the
fan-out growth a real scale-up produces.  FOR PERFORMANCE RUNS ONLY:
replicated text/embedding payloads make dedup/similarity answers
degenerate (every doc has k-1 exact copies), which is itself a useful
worst-case for the dedup family, but no correctness oracle applies here.

Generation is one narrow Spark job per table (union of k column-offset
selects — no shuffle, no python), ~a minute at k=10 on local[32].
"""

from __future__ import annotations

import hashlib
import os
import random
import string
from glob import glob

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from golang_mapreduce_spark.session import ensure_session_invariants
from golang_mapreduce_spark.sources.fixtures import load_table

#: key columns that must stay unique across replicas, per fact table
_FACT_OFFSET_KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

_DIMS = ["region", "nation", "customer", "supplier", "part"]

#: offset stride between replicas — far above any key at sf0.1
KEY_STRIDE = 100_000_000


def _cipher_pair(i: int) -> tuple[str, str]:
    """Per-replica deterministic substitution alphabet for F.translate:
    a seeded full permutation of letters and digits keyed on the replica
    index (replica 0 stays the identity).  Within a replica the mapping
    is a bijection, so every duplicate / near-duplicate relation among
    documents is PRESERVED inside the replica.  Across replicas the
    letter permutations are seeded independently, so two replicas
    sharing a letter mapping has probability ~k²/26! ≈ 0 (the round-7
    Caesar rotation repeated every 25 replicas, so at k=100 letter-only
    shingles collided across 4-replica classes — ADVICE r7); digit
    permutations draw from 10!, so digit-only shingles can still collide
    with probability ~k²/10! ≈ 10⁻³ at k=100 — negligible pair mass, and
    the only cross-replica collision channel left."""
    lower, upper, digits = string.ascii_lowercase, string.ascii_uppercase, string.digits
    src = lower + upper + digits
    if i == 0:
        return src, src
    rng = random.Random(int.from_bytes(hashlib.md5(f"cp:{i}".encode()).digest()[:8], "big"))
    pl = list(lower)
    rng.shuffle(pl)
    pd = list(digits)
    rng.shuffle(pd)
    dst = "".join(pl) + "".join(pl).upper() + "".join(pd)
    return src, dst


def _sign_flips(i: int, dim: int) -> list[int]:
    """Deterministic ±1 pattern per (replica, dimension): norms and all
    within-replica cosine geometry are preserved (a signed permutation
    is an isometry applied corpus-wide), while cross-replica cosines
    decorrelate — the embedding analog of the text cipher."""
    if i == 0:
        return [1] * dim
    return [
        1 if hashlib.md5(f"sg:{i}:{j}".encode()).digest()[0] % 2 == 0 else -1
        for j in range(dim)
    ]


def generate(
    spark: SparkSession, src_dir: str, out_dir: str, k: int = 10,
    perturb: bool = False,
) -> None:
    """Write a k-times scaled copy of src_dir's tables into out_dir.
    Idempotent via a completion marker; safe to call from bench.py.

    ``perturb=True`` (VERDICT r6 #5) additionally re-keys each
    documents/embeddings replica's PAYLOAD with a per-replica bijection
    (letter/digit rotation on text; sign-flip isometry on embeddings):
    replicas become mutually disjoint corpora instead of exact copies,
    so pair-mass operators (containment, weighted soft-dedup) scale the
    way a real crawl does — k× the pairs, not k²× — and their 100×
    probes measure the operator, not the replication degeneracy."""
    # _v2 versions the perturbed cipher (seeded full permutation, ADVICE
    # r7): dirs built with the round-7 rotation cipher regenerate.
    tag = f"_SCALED_x{k}" + ("_perturbed_v2" if perturb else "")
    marker = os.path.join(out_dir, tag)
    if os.path.exists(marker):
        return
    ensure_session_invariants(spark, events=True)  # legacy-nanos events read
    os.makedirs(out_dir, exist_ok=True)
    # A dir holds exactly ONE (k, mode) fixture: drop every other mode's
    # or scale's completion marker BEFORE writing, so a crash mid-write
    # or a mode switch can never leave a marker that vouches for data it
    # did not produce (ADVICE r7: generate(perturb=True) over a
    # perturb=False dir left both markers, and the next perturb=False
    # call returned early serving perturbed data).
    for stale in glob(os.path.join(out_dir, "_SCALED_x*")):
        os.remove(stale)
    for name in _DIMS:
        load_table(spark, src_dir, name).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    emb_dim, emb_elem = None, None
    if perturb:
        emb = spark.read.parquet(os.path.join(src_dir, "embeddings.parquet"))
        emb_dim = len(emb.select("embedding").head()["embedding"])
        # keep the physical element type (float vs double) unchanged
        emb_elem = emb.schema["embedding"].dataType.elementType.simpleString()
    for name, keys in _FACT_OFFSET_KEYS.items():
        # read the raw file (no ts normalization) so the scaled dir keeps
        # the source's physical layout and reads back through the same
        # layout-adaptive load_table branch as the original
        base = spark.read.parquet(os.path.join(src_dir, f"{name}.parquet"))
        replicas = []
        for i in range(k):
            rep = base
            for key in keys:
                rep = rep.withColumn(
                    key, F.col(key) + F.lit(i * KEY_STRIDE)
                )
            if perturb and name == "documents":
                src, dst = _cipher_pair(i)
                rep = rep.withColumn("text", F.translate("text", src, dst))
            if perturb and name == "embeddings":
                flips = F.array(
                    *[
                        F.lit(float(s)).cast(emb_elem)
                        for s in _sign_flips(i, emb_dim)
                    ]
                )
                rep = rep.withColumn(
                    "embedding",
                    F.zip_with("embedding", flips, lambda x, s: (x * s).cast(emb_elem)),
                )
            replicas.append(rep)
        out = replicas[0]
        for rep in replicas[1:]:
            out = out.unionByName(rep)
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    with open(marker, "w") as f:
        f.write("ok\n")
