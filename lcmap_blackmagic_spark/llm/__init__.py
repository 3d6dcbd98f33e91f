"""Large-scale training-data pipeline operators.

Beyond the reference's own surface (BASELINE.json north-star): exact
and approximate deduplication, embedding similarity search, text
analysis, and multimodal column plumbing — each designed so the heavy
path is a shuffle-bounded DataFrame plan, not a driver loop.
"""

from .text import tokens, token_count, quality_scores, lang_id, fingerprint
from .dedup import (shingles, minhash_signature, minhash_pairs,
                    simhash_bits, simhash_pairs, ngram_jaccard_pairs)
from .similarity import cosine_topk, lsh_ann_topk

__all__ = [
    "tokens", "token_count", "quality_scores", "lang_id", "fingerprint",
    "shingles", "minhash_signature", "minhash_pairs", "simhash_bits",
    "simhash_pairs", "ngram_jaccard_pairs", "cosine_topk", "lsh_ann_topk",
]
