"""Property tests for the one-permutation-hashing MinHash kernel
(operators/dedup.py: minhash_signatures / _oph_doc_state / _oph_slot).

The OPH signature feeds banding, candidate generation, and the
estimate-quality audit; a densification off-by-one would silently skew
every minhash op while staying self-consistent (LSH ops are rows-only,
so no oracle would catch it). Reference: a direct Python transcription
of the Li/Owen/Zhang scheme as documented in the kernel docstring —
bin b's entry is min{s : s mod k = b}, and an EMPTY bin borrows the
value of filled bin (b mod m) in the filled-bin subsequence (sorted by
bin, m = number of filled bins).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataengineeringutils_spark.operators.dedup import (
    N_HASHES,
    minhash_signatures,
)

SHINGLE = st.integers(min_value=-(2**62), max_value=2**62)


def _oph_reference(shingles: set[int], k: int = N_HASHES) -> list[int]:
    bins: dict[int, int] = {}
    for s in shingles:
        b = s % k  # python % matches Spark pmod for the sign convention
        bins[b] = min(bins.get(b, s), s)
    filled = [bins[b] for b in sorted(bins)]
    m = len(filled)
    return [bins[b] if b in bins else filled[b % m] for b in range(k)]


@given(
    shingles=st.sets(SHINGLE, min_size=1, max_size=120),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_oph_signature_matches_reference(spark, shingles):
    sh = spark.createDataFrame(
        [(1, s) for s in shingles], schema="doc_id bigint, s bigint"
    )
    got = minhash_signatures(sh).collect()
    assert len(got) == 1
    assert list(got[0]["sig"]) == _oph_reference(shingles)


def test_oph_dense_doc_every_bin_filled(spark):
    """A doc with >= one shingle per bin never borrows: every slot is
    its own bin's min."""
    shingles = set(range(N_HASHES * 3))  # fills every residue class
    sh = spark.createDataFrame(
        [(7, s) for s in shingles], schema="doc_id bigint, s bigint"
    )
    sig = list(minhash_signatures(sh).collect()[0]["sig"])
    assert sig == [b for b in range(N_HASHES)]  # min of residue class b


def test_oph_single_shingle_fills_all_slots(spark):
    """One shingle -> one filled bin -> all 64 slots borrow that value
    (the docstring's 'a doc with >= 1 shingle always fills every slot')."""
    sh = spark.createDataFrame(
        [(3, 129)], schema="doc_id bigint, s bigint"
    )
    sig = list(minhash_signatures(sh).collect()[0]["sig"])
    assert sig == [129] * N_HASHES
