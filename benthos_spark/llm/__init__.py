"""Beyond-reference operators for large-scale training-data pipelines.

Not present in the reference (Benthos stops at per-record transforms);
these are the operations a 100 TB document/embedding corpus needs, each
designed as shuffled-once DataFrame transforms:

``dedup``       exact, MinHash+LSH, SimHash, n-gram Jaccard,
                embedding-cosine near-duplicate detection.
``similarity``  brute-force and LSH-bucketed cosine top-k search.
``text``        language-ID, quality scoring, token counting,
                document fingerprinting.
``multimodal``  binary media columns + typed metadata; decode stubbed
                (media libs absent here), Spark plumbing real.
"""

from benthos_spark.llm import dedup, multimodal, similarity, text  # noqa: F401
