"""Large-scale data-pipeline operators (BASELINE.json north star).

All hot paths here are pure Catalyst expressions (higher-order array
functions, hash functions, relational reshapes) — no Python UDFs — so
they whole-stage-codegen and scale with executors. Shapes:

- dedup: exact (content hash), MinHash+LSH (shingle → minhash → band →
  bucket join), SimHash (explode-words → bit votes → fingerprint),
  n-gram Jaccard (exact verify), embedding-cosine near-dup
- similarity: brute-force cosine top-k; LSH-bucketed ANN (random
  hyperplane signs) as the scale path
- text: language ID (stopword/charset heuristic), quality scoring,
  token counting, rolling-hash fingerprinting
- multimodal: binary payload columns with typed metadata; decode stubs
  behind mapInPandas plumbing (image/audio libs absent by design)
"""

from .dedup import (  # noqa: F401
    content_hash,
    exact_dup_groups,
    lsh_band_keys,
    minhash_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from .similarity import (  # noqa: F401
    cosine_expr,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_bucket_topk,
    topk_neighbors,
)
from .skew import salted_join  # noqa: F401
from .text import (  # noqa: F401
    doc_fingerprint,
    language_id,
    quality_features,
    token_count,
)
from .multimodal import (  # noqa: F401
    attach_payload_metadata,
    decode_image_stub,
    extract_payload_features,
)
