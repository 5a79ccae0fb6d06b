#!/usr/bin/env python3
"""Real 2-process jax.distributed dryrun (VERDICT r3 missing #1).

Launches N_PROC worker processes on the CPU backend (gloo collectives),
each owning N_LOCAL virtual devices, builds the hybrid identify mesh
(parallel/dist.py: "dp" spans processes over DCN, "ip" stays inside
each process's ICI domain), runs the mesh-sharded TURBO classify step
over a synthetic skewed corpus, and asserts the dp-spanning result
equals a single-process run bit-for-bit on the integer count tensors.

Run:  python tools/dryrun_dist.py            (spawns workers itself)
      KASA_DIST_ROLE=worker ... internal     (worker entry)

Writes bench_results/dist_dryrun.json.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

N_PROC = 2
N_LOCAL = 4       # virtual cpu devices per process
PORT = 12787


def worker(pid: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={N_LOCAL}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=N_PROC, process_id=pid)
    assert jax.process_count() == N_PROC
    assert jax.device_count() == N_PROC * N_LOCAL

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from kasa_tpu.parallel.dist import make_identify_mesh
    from kasa_tpu.parallel.turbo_mesh import (MeshTurboDispatch,
                                              ShardedTurboTables)
    from kasa_tpu.match.turbo import TurboTables, fused_turbo_acc
    from kasa_tpu.match.fast import BatchAssembler
    from kasa_tpu.core.encode import build_codon_code_lut

    # deterministic synthetic corpus, identical in every process
    rng = np.random.default_rng(11)
    dna4 = np.frombuffer(b"ACGT", np.uint8)
    S = 33
    gene = rng.integers(0, 4, size=90)        # shared by every 3rd
    genomes = []
    for g in range(S):
        d = rng.integers(0, 4, size=420)
        if g % 3 == 0:
            off = int(rng.integers(0, 330))
            d[off:off + 90] = gene
        genomes.append(dna4[d])
    from kasa_tpu.core.encode import dna_to_aa_codes_np, encode_windows_np
    lut_np = build_codon_code_lut()
    all_l, all_t = [], []
    for g, d in enumerate(genomes):
        aa = dna_to_aa_codes_np(d, lut_np)
        win = encode_windows_np(aa, 12, 3)[:len(d) - 36 + 1]
        all_l.append(win)
        all_t.append(np.full(len(win), g + 1, np.int32))
    limbs = np.concatenate(all_l)
    tax = np.concatenate(all_t)
    order = np.lexsort((tax, limbs[:, 1], limbs[:, 0]))
    limbs, tax = np.ascontiguousarray(limbs[order]), tax[order]
    keep = np.ones(len(tax), bool)
    keep[1:] = np.any(limbs[1:] != limbs[:-1], axis=1) \
        | (tax[1:] != tax[:-1])
    limbs, tax = np.ascontiguousarray(limbs[keep]), tax[keep]

    # reads
    R = 256
    rlen = 100
    reads = np.zeros((R, rlen), np.uint8)
    src = rng.integers(0, S, size=R)
    for i in range(R):
        g = genomes[src[i]]
        off = int(rng.integers(0, len(g) - rlen))
        reads[i] = g[off:off + rlen]

    asm = BatchAssembler(12, 7, False, False, False)
    maxlen = rlen + asm.marker_len
    maxlen = (maxlen + 15) // 16 * 16
    blob = reads.reshape(-1)
    offs = np.arange(R + 1, dtype=np.int64) * rlen
    mat = asm.assemble(blob, offs, maxlen, R)
    w = asm.window_target(maxlen)
    lut = jnp.asarray(lut_np, jnp.int32)

    tt = TurboTables.build_from_arrays(limbs, tax, 12, 7, 12, S + 1)

    # single-device reference counts (same math in every process)
    acc0 = (jnp.zeros((6, S + 1), jnp.float32),
            jnp.zeros((6, S + 1), jnp.int32))
    _p, _ht, _hk, ca1, cu1 = fused_turbo_acc(
        tt.keys2, tt.rowdat, tt.router, tt.sub2, tt.grp2, tt.d_tax4,
        tt.weights, tt.masks2, tt.hotmask, tt.t_hot,
        jnp.asarray(mat), lut, *acc0,
        tt.num_steps, 7, 12, 12, S + 1, R, False, False, 1, w, 4 * R)
    ca1, cu1 = np.asarray(ca1), np.asarray(cu1)

    # hybrid mesh: dp spans the two processes, ip = local devices
    mesh = make_identify_mesh(ip=N_LOCAL, dp=N_PROC)
    st = ShardedTurboTables.build(limbs, tax, 12, 7, 12, S + 1,
                                  N_LOCAL, host_tables=tt)
    disp = MeshTurboDispatch(st, mesh)
    acc = disp.new_acc()
    rows_pad = disp.round_rows(R)
    cap = disp.csr_cap(rows_pad)
    packed_d, ht_d, hk_d, ca_d, cu_d = disp.dispatch(
        mat, lut, *acc, rows_pad, False, False, 1, w, cap)
    # count/packed tensors span both processes' dp slices: gather the
    # global value (a real multi-host deployment keeps per-host ingest
    # and only ever fetches host-local dp rows)
    from jax.experimental import multihost_utils
    packed_g = multihost_utils.process_allgather(packed_d, tiled=True)
    ca_g = multihost_utils.process_allgather(ca_d, tiled=True)
    cu_g = multihost_utils.process_allgather(cu_d, tiled=True)
    ca2 = np.asarray(ca_g).sum(axis=0)
    cu2 = np.asarray(cu_g).astype(np.int64).sum(axis=0)

    assert np.array_equal(cu1.astype(np.int64), cu2), \
        "distributed unique counts != single-device"
    assert np.allclose(ca1, ca2, rtol=2e-5, atol=1e-3), \
        "distributed count matrix diverged"
    # flags decode must agree too (no silent shape issues)
    hc, ofc, ofl, nflag, _, _ = disp.decode(
        np.asarray(packed_g), rows_pad, R, cap, False)
    if pid == 0:
        print(f"DIST-OK procs={N_PROC} devices={jax.device_count()} "
              f"mesh=dp{N_PROC}xip{N_LOCAL} unique_sum={int(cu2.sum())} "
              f"flagged={int(nflag)}", flush=True)
    jax.distributed.shutdown()


def main():
    if os.environ.get("KASA_DIST_ROLE") == "worker":
        worker(int(os.environ["KASA_DIST_PID"]))
        return
    t0 = time.time()
    procs = []
    for pid in range(N_PROC):
        env = dict(os.environ)
        env["KASA_DIST_ROLE"] = "worker"
        env["KASA_DIST_PID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    rc = 0
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode(errors="replace"))
        rc |= p.returncode
    ok = rc == 0 and any("DIST-OK" in o for o in outs)
    res = {"ok": ok, "rc": rc, "procs": N_PROC,
           "devices_per_proc": N_LOCAL,
           "elapsed_s": round(time.time() - t0, 1),
           "tail": outs[0][-2000:]}
    os.makedirs(os.path.join(REPO, "bench_results"), exist_ok=True)
    with open(os.path.join(REPO, "bench_results", "dist_dryrun.json"),
              "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps({k: v for k, v in res.items() if k != "tail"}))
    if not ok:
        print(outs[0][-3000:])
        sys.exit(1)


if __name__ == "__main__":
    main()
