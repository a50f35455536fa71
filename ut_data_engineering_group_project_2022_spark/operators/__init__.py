"""Composite operators: dedup (exact/MinHash/SimHash/Jaccard), similarity
search, star-schema loading, graph algorithms, multimodal plumbing."""
