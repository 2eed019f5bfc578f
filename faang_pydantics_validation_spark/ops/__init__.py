"""Large-scale training-data pipeline operators.

Beyond the reference's validation surface, these are the operations a
100 TB training-data pipeline runs over the same tables: deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard, with transitive
component resolution), similarity search over embedding columns, text
analysis (language id, quality scores, token counts, fingerprints),
deterministic hash-based sampling (uniform / stratified / exact-N per
stratum), and multimodal binary-column plumbing. All
DataFrame-native; Python touches data only through Arrow-batched pandas
UDFs where expressions genuinely cannot express the op.
"""
