"""ML surface of the engine (SURVEY §2j).

The reference's one ML component is an IsolationForest anomaly detector
over the daily sales aggregate (pipeline/ml/anomaly_detection.py).
sklearn is not a dependency here; :mod:`isolation_forest` is a small
seeded NumPy implementation of the same algorithm.
"""
