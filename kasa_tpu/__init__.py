"""kASA-TPU: a TPU-native taxonomic k-mer classifier framework.

A from-scratch re-design of the capabilities of SilvioWeging/kASA
(k-mer Analysis of Sequences based on Amino acid-like encoding,
NAR gkab200) for TPUs using JAX/XLA/Pallas.

The reference is a single-node C++ binary built around a sorted
external-memory (k-mer, taxid) array (reference: source/kASA.hpp,
source/modes/*.hpp).  This framework keeps the same *capability
surface* — index build / identify / update / shrink / merge / content
file tooling, with byte-compatible on-disk artifact formats — but the
compute path is re-architected for TPU:

  * k-mers are held as 2 (or 5, for k<=25) 30-bit limbs in int32
    arrays so that all hot compares/sorts run natively on the VPU
    (TPUs have no fast 64-bit integer path),
  * the classifier's stateful CPU merge-join (reference:
    Compare.hpp:679-1069) is re-cast as sort + vectorized
    lexicographic binary-search + segment-sum scoring,
  * scaling is via jax.sharding over a device mesh (prefix-sharded
    index + all_to_all routing) instead of threads over disjoint
    stxxl ranges.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: first TPU compile of the encode /
# search kernels costs tens of seconds over the device tunnel; cache it
# across processes (safe to set before jax initializes a backend).
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    _cache = _os.path.join(_os.path.expanduser("~"), ".cache", "kasa_tpu_xla")
    _os.makedirs(_cache, exist_ok=True)
    _os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

HIGHEST_K_64 = 12     # k <= 12 fits 60 bits  (reference: kASA.hpp:48)
HIGHEST_K_128 = 25    # k <= 25 fits 125 bits (reference: MetaHeader.h HIGHESTPOSSIBLEK)
LOWEST_K = 1
