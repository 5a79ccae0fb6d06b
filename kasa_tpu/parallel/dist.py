"""Multi-host initialization + DCN-aware mesh construction.

The reference is strictly single-process (SURVEY §2.5: no inter-node
communication of any kind); scaling beyond one host is new TPU-native
design:

  * every host runs the same program and calls ``init_distributed()``
    (jax.distributed.initialize) -- coordinator discovery follows the
    standard JAX env contract (``JAX_COORDINATOR_ADDRESS``/
    ``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``) or the TPU-pod metadata
    autodetection when no env is set;
  * the mesh is laid out so the INDEX-PARALLEL axis ("ip") stays
    inside each host's ICI domain (the index-shard psum is the hot
    collective) while DATA-PARALLEL ("dp") spans hosts over DCN --
    per-host ingest feeds the host-local dp slice and nothing but the
    final per-read score rows ever crosses DCN;
  * host-side prefix routing (mesh.route_queries) means queries are
    placed directly on their owning shard's host feed, so there is no
    all_to_all at all: the measured tradeoff vs broadcast+psum is in
    docs/parallel.md.
"""

from __future__ import annotations

import os

import numpy as np


def init_distributed() -> bool:
    """Initialize jax.distributed when a multi-process environment is
    configured; returns True when running multi-process."""
    import jax

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]))
        return True
    if os.environ.get("KASA_TPU_AUTODETECT_POD"):
        # TPU pod runtime metadata path (no explicit coordinator)
        jax.distributed.initialize()
        return True
    return False


def make_identify_mesh(ip: int | None = None, dp: int | None = None):
    """Device mesh (dp, ip) with "ip" innermost so the per-shard psum
    rides ICI; across hosts, "dp" maps to whole processes (DCN).

    Single-host: a plain reshape of local devices.  Multi-host: a
    hybrid mesh with dp spanning processes (each host holds complete
    index-shard groups, so the score psum never leaves the host)."""
    import jax
    from jax.sharding import Mesh

    n_local = jax.local_device_count()
    n_proc = jax.process_count()
    n_total = jax.device_count()

    if ip is None:
        ip = n_local if dp is None else max(n_total // dp, 1)
    if dp is None:
        dp = n_total // ip
    if dp * ip != n_total:
        raise ValueError(f"mesh {dp}x{ip} != {n_total} devices")

    if n_proc > 1:
        if ip > n_local or n_local % ip:
            raise ValueError(
                "index-parallel axis must divide the per-host device count "
                "so the index-shard psum stays on ICI")
        from jax.experimental import mesh_utils
        # TPU pods group by slice; CPU/multi-host-sim processes carry
        # no distinct slice_index, so the process is the DCN granule
        slices = {getattr(d, "slice_index", None) for d in jax.devices()}
        by_process = len(slices) <= 1
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(n_local // ip, ip),
            dcn_mesh_shape=(n_proc, 1),
            process_is_granule=by_process)
        return Mesh(devices, ("dp", "ip"))
    devices = np.asarray(jax.devices()[:dp * ip]).reshape(dp, ip)
    return Mesh(devices, ("dp", "ip"))
