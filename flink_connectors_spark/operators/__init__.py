"""Large-scale training-data pipeline operators.

- ``dedup``      : exact, MinHash+LSH, SimHash, n-gram Jaccard,
                   embedding-cosine near-duplicate detection
- ``similarity`` : brute-force and cluster-probed top-k ANN
- ``text``       : language-ID, quality scoring, token stats,
                   fingerprinting
- ``multimodal`` : opaque binary columns with typed metadata; decode /
                   featurize plumbing over mapInPandas (decode stubbed
                   — media libs absent in this environment)

All operators are DataFrame->DataFrame, shuffle-parallel (no driver
collects), and avoid Python UDFs except where vectorized math
genuinely beats array expressions.
"""
