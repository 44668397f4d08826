"""Ray Data stage library: vectorized ``map_batches`` functions and
actor-pool classes. Every function here takes and returns
``pyarrow.Table`` batches (``batch_format="pyarrow"``, zero-copy) unless
documented otherwise; no function touches ``ray.init``.
"""
