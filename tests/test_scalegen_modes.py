"""Scale-fixture mode hygiene (ADVICE r7).

1. A dir holds exactly ONE (k, mode) fixture: regenerating with a
   different mode must drop the other mode's completion marker, so a
   later call can never be served wrong-mode data.
2. The perturbed cipher is a seeded FULL permutation per replica: no
   two replicas share a letter mapping (the round-7 Caesar rotation
   repeated every 25 replicas, quietly reintroducing pair-mass
   degeneracy at k=100).
"""

from __future__ import annotations

import os
import string
import tempfile
from glob import glob

from golang_mapreduce_spark.tools import scalegen


def test_cipher_is_bijection_and_distinct_across_replicas():
    seen_letters = set()
    for i in range(101):
        src, dst = scalegen._cipher_pair(i)
        assert len(src) == len(dst) == 62
        assert sorted(src) == sorted(dst)  # bijection over the alphabet
        lower_map = dst[:26]
        assert sorted(lower_map) == list(string.ascii_lowercase)
        assert lower_map not in seen_letters, f"replica {i} repeats a letter map"
        seen_letters.add(lower_map)
        # case-consistency: upper mapping mirrors lower
        assert dst[26:52] == lower_map.upper()
    assert scalegen._cipher_pair(0)[1].startswith(string.ascii_lowercase)


def test_mode_switch_drops_other_modes_marker(spark):
    src = "/root/testdata/sf0.001"
    out = tempfile.mkdtemp(prefix="gmrs_scalemode_")
    scalegen.generate(spark, src, out, k=2, perturb=False)
    plain = glob(os.path.join(out, "_SCALED_x*"))
    assert len(plain) == 1 and "perturbed" not in plain[0]

    scalegen.generate(spark, src, out, k=2, perturb=True)
    markers = glob(os.path.join(out, "_SCALED_x*"))
    assert len(markers) == 1 and markers[0].endswith("_perturbed_v2"), markers

    # idempotence within the same mode: marker short-circuits
    mtime = os.path.getmtime(os.path.join(out, "documents.parquet"))
    scalegen.generate(spark, src, out, k=2, perturb=True)
    assert os.path.getmtime(os.path.join(out, "documents.parquet")) == mtime
