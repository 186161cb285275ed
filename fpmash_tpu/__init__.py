"""fpmash_tpu — a TPU-native sketch-and-distance framework.

A from-scratch rebuild of the fp-mash pipeline (lyn2vec Lyndon-factorization
fingerprints + a MinHash sketch/distance engine) designed for TPU hardware:

* the compute path (factorization, MurmurHash3, bottom-k selection, pairwise
  sketch comparison) is batched JAX/XLA (with Pallas kernels for hot ops),
* scale-out is ``jax.sharding.Mesh`` + ``shard_map`` data parallelism with
  XLA collectives, replacing the reference's pthread pool / fork pool,
* host-side glue (CLI, FASTA/fingerprint/.msh IO, stats) is plain Python with
  optional C++ fast paths under ``native/``.

Parity oracle: the reference repo's golden fixtures (see ``tests/golden``).
Reference behavior is cited in docstrings as ``file:line`` into the upstream
tree (e.g. ``mash/src/mash/Sketch.cpp:56``).
"""

import os

import jax

# The sketch engine hashes 64-bit lanes (MurmurHash3_x64_128 over uint64
# factor-length vectors, ref hash.cpp:45-73); uint64 arrays require x64 mode.
# This must run before any JAX arrays are created.
jax.config.update("jax_enable_x64", True)

# Kernel shapes are bucketed to a small fixed set (see models.sketch), so a
# persistent compilation cache would make every process after the first
# start warm — but it is OPT-IN only (FPMASH_COMPILE_CACHE=<dir>): in
# environments with remote/offloaded compilation (e.g. the axon TPU tunnel
# with PALLAS_AXON_REMOTE_COMPILE) cached XLA:CPU AOT artifacts can carry
# the remote machine's CPU features and silently compute wrong results on
# the local host.
_cache_dir = os.environ.get("FPMASH_COMPILE_CACHE")
if _cache_dir:
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is best-effort
        pass

__version__ = "0.1.0"
