"""Locks on the computed sign-LSH key width (round 8 — VERDICT r7
item 1): the width rule itself, its landing points at the driver and
probe scales, and bit-equality between the computed-width query
(`dedup_semantic_autokey`) and the oracle-pinned static 8-bit twin
(`dedup_semantic_scaled`) at driver scale."""

from __future__ import annotations

import os

from bigdatafinalproject_hockey_spark.queries import QUERIES
from bigdatafinalproject_hockey_spark.queries.scale import _parquet_num_rows
from bigdatafinalproject_hockey_spark.similarity import computed_bits_per_band

SF_SMOKE = "/root/testdata/sf0.001"
SF_DRIVER = "/root/testdata/sf0.01"


def test_width_rule_landing_points():
    """The rule is bits = max(8, ceil(log2 C)) at num_bands == target:
    every driver SF floors at 8 (bit-identical to the static oracle
    family); the bench's x10 corpus crosses to 9; the 100× corpus
    lands on the 12-bit configuration measured linear in round 7."""
    assert computed_bits_per_band(1) == 8
    assert computed_bits_per_band(10) == 8      # sf0.001/sf0.01 (n=500)
    assert computed_bits_per_band(40) == 8      # sf0.1 (n=2000)
    assert computed_bits_per_band(400) == 9     # emb_x10 (n=20k)
    assert computed_bits_per_band(4000) == 12   # emb_x100 (n=200k)


def test_width_rule_is_monotone_and_bounds_candidates():
    """Candidates/vector = num_bands * C / 2^bits must stay <= num_bands
    for every C (the O(1) invariant the quadratic 8-bit regime broke:
    at C=4000 fixed 8 bits gives 125 candidates/vector)."""
    prev = 0
    for c in [1, 10, 40, 100, 256, 400, 1000, 4000, 10_000, 1_000_000]:
        bits = computed_bits_per_band(c)
        assert bits >= prev
        prev = bits
        if bits > 8:  # above the floor the target bound is exact
            assert 8 * c / (1 << bits) <= 8.0, (c, bits)


def test_driver_sfs_sit_on_the_floor():
    for sf_dir in (SF_SMOKE, SF_DRIVER, "/root/testdata/sf0.1"):
        n = _parquet_num_rows(os.path.join(sf_dir, "embeddings.parquet"))
        assert computed_bits_per_band(max(n // 50, 1)) == 8, sf_dir


def test_autokey_bit_identical_to_static_twin_at_driver_scale(spark):
    """At driver scale the computed width floors at 8 bits, so the
    autokey query must produce byte-identical survivors to the static
    8-bit `dedup_semantic_scaled` — same sidecar, same assignment,
    same drop rule. This is the equality that lets the static oracle
    family verify the computed-width path end-to-end."""
    a = sorted(
        tuple(r) for r in
        QUERIES["dedup_semantic_autokey"](spark, SF_DRIVER).collect()
    )
    b = sorted(
        tuple(r) for r in
        QUERIES["dedup_semantic_scaled"](spark, SF_DRIVER).collect()
    )
    assert a == b
    assert len(a) > 0
