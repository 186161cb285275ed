"""Multi-chip scale-out: mesh construction + sharded pipelines.

Replaces the reference's single-host parallelism (pthread ThreadPool,
fork-based multiprocessing.Pool — SURVEY §2.4) with data parallelism over a
``jax.sharding.Mesh``: reads/windows shard across devices, per-shard
bottom-k candidates and all-pairs distance tiles merge with XLA collectives
over ICI.  Deterministic output ordering is preserved (the batch formation
is order-stable, mirroring the reference's ordered ThreadPool output).
"""

from fpmash_tpu.parallel.mesh import default_mesh
from fpmash_tpu.parallel.sharded import (
    sharded_fingerprint_hashes,
    sharded_bottom_k,
    sharded_all_pairs,
    pipeline_step,
)
