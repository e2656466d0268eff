"""Large-scale training-data pipeline operators.

Not present in the reference (its surface stops at relational ETL);
these are the ops a 100 TB LLM-data pipeline needs: deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search (brute-force + IVF-bucketed ANN), text analysis
(language-ID, quality scoring, token counting, fingerprinting) and
multimodal column plumbing.

Everything is built from JVM-side Spark expressions (no Python in the
hot path) except media decoding, which is Arrow-batched mapInPandas.
"""

from conveyor_spark.datapipe import (  # noqa: F401
    bloom,
    bpe,
    clustering,
    components,
    curation,
    dedup,
    embedding,
    features,
    funnel,
    fuzzy,
    graph,
    mining,
    mmr,
    similarity,
    text,
    multimodal,
    packing,
    pca,
    quality,
    resample,
    scoring,
    selection,
    split,
    stats,
    structure,
    substring,
    webtext,
    winnow,
)
