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
``sampling``    deterministic mixture/temperature sampling, splits,
                DSIR importance resampling.
``search``      BM25 retrieval and TF-IDF keyword extraction.
``packing``     sequence packing (concat-split and best-fit).
``tokenizer``   trainable BPE (merge learning + Arrow apply).
``pipeline``    quality -> dedup -> decontaminate curation, composed.
"""

from benthos_spark.llm import (dedup, multimodal, packing,  # noqa: F401
                               pipeline, sampling, search, similarity,
                               text, tokenizer)
