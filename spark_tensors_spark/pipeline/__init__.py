"""LLM-data-pipeline operators over `documents` / `embeddings`
(SURVEY §7.1 M4; BASELINE.json north star): dedup (exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding near-dup), similarity search
(brute-force + LSH-bucketed ANN), text analysis (lang-ID, quality,
token stats, fingerprints), multimodal column plumbing.
"""
