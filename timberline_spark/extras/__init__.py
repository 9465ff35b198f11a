"""Training-data-pipeline operators beyond the reference's own surface.

These are the operations a 100 TB training-data pipeline needs over the
``documents`` / ``embeddings`` tables: dedup families (exact, n-gram
Jaccard, MinHash-LSH, SimHash, embedding-cosine), similarity search
(brute-force + LSH-bucketed ANN), text analysis (language-ID, quality,
token counting, fingerprinting), and multimodal binary-column plumbing.
"""
