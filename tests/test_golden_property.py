"""Property test for the golden text sink: any (key, value) table whose
keys are whitespace-free round-trips byte-exactly through
write_golden_text → read_golden_text (the reference's `"%v %v"` line
format is only unambiguous under that precondition — the same constraint
the reference's own outputs satisfy, worker.go:223-249)."""

from __future__ import annotations

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

KEY = st.text(
    alphabet=st.characters(
        codec="ascii", categories=("L", "N", "P", "S")
    ),
    min_size=1,
    max_size=12,
).filter(lambda s: not any(c.isspace() for c in s))

# values may contain spaces (the regex parses key = first token only),
# but not newlines/CR (line-framed format) and no leading/trailing
# whitespace (text source strips nothing, but trailing blanks are
# ambiguous against DataFrame string equality)
VALUE = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\n\r"),
    max_size=30,
).filter(lambda s: s == s.strip())


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(st.tuples(KEY, VALUE), min_size=1, max_size=25))
def test_golden_roundtrip_property(spark, rows):
    from golang_mapreduce_spark.sources.golden import (
        read_golden_text,
        write_golden_text,
    )

    df = spark.createDataFrame(rows, "key string, value string")
    path = tempfile.mkdtemp(prefix="gmrs_golden_prop_") + "/out"
    write_golden_text(df, path, sorted_output=True)
    back = read_golden_text(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(rows)
