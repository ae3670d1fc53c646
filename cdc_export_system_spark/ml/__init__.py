"""Supervised-ML operators (engine extension, north-star family `ml`).

The unsupervised side already lives in similarity/ (k-means, PCA, IVF,
PQ); this package adds the supervised staples a data-pipeline engine is
asked to run in-database: regression, classification, and the
sufficient-statistics pattern that makes both distributed — the cluster
reduces 100 TB to a model-sized aggregate, the driver does the O(k³)
algebra, and the model broadcasts back for scoring.
"""
