#!/usr/bin/env python3
"""identify_multiple packing benchmark WITH per-file profiles (r5;
VERDICT r4 #7 "Done" = profiles on, outputs identical, speedup >= 4x).

Splits the bench corpus reads into a folder of files with a realistic
size spread (the reference's job shop exists because folders mix
small and large files, main.cpp:1150-1166), then times

  serial: per-file identify (KASA_NO_MULTIPACK=1, parse prefetch)
  packed: one shared batch stream with per-file output demux and
          per-file count kernels (turbo.fused_turbo_files)

both with per-read json AND per-file profile CSVs.  Verifies the two
modes' outputs agree (json byte-identical; profiles numerically, f32
order tolerance) and writes bench_results/multifile_sim.json.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench_corpus

SPLIT = [512, 1024, 2048, 2048, 4096, 8192, 16384, 32768, 49152]
DIR = os.path.join(bench_corpus.DIR, "multi")
OUT = "/tmp/kasa_multi_bench"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_folder(c):
    total = sum(SPLIT)
    if os.path.isdir(DIR) and len(os.listdir(DIR)) == len(SPLIT):
        return
    shutil.rmtree(DIR, ignore_errors=True)
    os.makedirs(DIR)
    with open(c["reads"], "rb") as fh:
        lines = fh.read().split(b"\n")
    reads = [lines[i:i + 4] for i in range(0, total * 4, 4)]
    pos = 0
    for i, n in enumerate(SPLIT):
        with open(os.path.join(DIR, f"part{i:02d}.fastq"), "wb") as fh:
            for r in reads[pos:pos + n]:
                fh.write(b"\n".join(r) + b"\n")
        pos += n


def run(tag, nopack):
    import contextlib
    from kasa_tpu.config import Config
    from kasa_tpu.match.pipeline import identify
    if nopack:
        os.environ["KASA_NO_MULTIPACK"] = "1"
    else:
        os.environ.pop("KASA_NO_MULTIPACK", None)
    cfg = Config()
    cfg.engine = "tpu"
    cfg.content_file = bench_corpus.INDEX + "_content.txt"
    d = os.path.join(OUT, tag)
    os.makedirs(d, exist_ok=True)
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(sys.stderr):
        identify(cfg, index_path=bench_corpus.INDEX, input_path=DIR,
                 out_file=os.path.join(d, "q_"),
                 profile_file=os.path.join(d, "p_"))
    return time.perf_counter() - t0


def compare():
    import numpy as np
    ident = True
    for i in range(len(SPLIT)):
        a = os.path.join(OUT, "packed", f"q_part{i:02d}.json")
        b = os.path.join(OUT, "serial", f"q_part{i:02d}.json")
        if open(a, "rb").read() != open(b, "rb").read():
            log(f"# json differs: part{i:02d}")
            ident = False
        pa = open(os.path.join(OUT, "packed", f"p_part{i:02d}.csv")) \
            .read().splitlines()
        pb = open(os.path.join(OUT, "serial", f"p_part{i:02d}.csv")) \
            .read().splitlines()
        if len(pa) != len(pb):
            log(f"# profile row count differs: part{i:02d}")
            ident = False
            continue
        for la, lb in zip(pa, pb):
            ca, cb = la.split(","), lb.split(",")
            if ca[:2] != cb[:2]:
                log(f"# profile key differs: part{i:02d}: {ca[:2]} {cb[:2]}")
                ident = False
                break
            for va, vb in zip(ca[2:], cb[2:]):
                try:
                    fa, fb = float(va), float(vb)
                except ValueError:
                    if va != vb:
                        ident = False
                    continue
                if abs(fa - fb) > 2e-4 * max(abs(fa), abs(fb), 1e-2):
                    log(f"# profile value diverged part{i:02d}: "
                        f"{va} vs {vb}")
                    ident = False
                    break
    return ident


def main():
    c = bench_corpus.ensure_corpus(log=log)
    make_folder(c)
    shutil.rmtree(OUT, ignore_errors=True)
    from kasa_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()
    log("# warm (packed) ...")
    t_warm = run("warmup", nopack=False)
    log(f"# warm: {t_warm:.1f}s")
    t_serial = run("serial", nopack=True)
    log(f"# serial: {t_serial:.1f}s")
    t_packed = run("packed", nopack=False)
    log(f"# packed: {t_packed:.1f}s")
    ident = compare()
    res = {"serial_s": round(t_serial, 2),
           "packed_s": round(t_packed, 2),
           "speedup": round(t_serial / t_packed, 2),
           "files": len(SPLIT), "reads": sum(SPLIT),
           "profiles": True,
           "outputs_identical": bool(ident)}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(repo, "bench_results"), exist_ok=True)
    with open(os.path.join(repo, "bench_results",
                           "multifile_sim.json"), "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
