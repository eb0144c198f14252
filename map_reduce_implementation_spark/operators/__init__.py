"""Scale-focused operator implementations (dedup, similarity, text,
multimodal) used by the suite and reusable as a library surface."""
