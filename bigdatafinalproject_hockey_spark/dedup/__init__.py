"""Deduplication operators for training-data pipelines.

Four tiers, cheapest first — at 100 TB you run them in this order:

1. exact (hash groupBy on a normalized fingerprint) — one shuffle on
   a short key.
2. n-gram/token Jaccard within blocks — exact near-dup inside small
   candidate blocks (token inverted-index self-join).
3. MinHash + LSH banding — sub-quadratic candidate generation for
   corpus-scale near-dup.
4. SimHash — constant-size fingerprints, hamming-distance candidate
   pairs.
"""

from bigdatafinalproject_hockey_spark.dedup import exact, jaccard, minhash, simhash  # noqa: F401
