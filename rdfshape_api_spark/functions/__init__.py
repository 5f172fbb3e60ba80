"""Large-scale training-data pipeline operators (driver brief §extras).

Not part of the reference surface — these are the first-class data-prep
operators a 100 TB corpus pipeline needs: dedup (exact / MinHash-LSH /
SimHash / n-gram Jaccard / embedding), similarity search, text analysis,
multimodal column plumbing. All built on the driver's ``documents`` /
``embeddings`` tables.
"""
