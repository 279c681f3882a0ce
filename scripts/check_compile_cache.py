#!/usr/bin/env python
"""Does the persistent XLA compilation cache cover the serving program
across process restarts? (VERDICT r4 Next #4: the 81-object serve step
costs ~837 s to compile on the tunneled AOT toolchain — operationally it
matters whether a restart pays it again.)

Runs the SAME serve-step compile in two fresh subprocesses sharing a
persistent cache dir and reports both wall times: a large second-run
speedup = the cache covers the program. Uses a small catalog so the
answer arrives in minutes; cache coverage is keyed on (HLO, options,
backend), so it generalizes to the 81-object shape.

Prints one JSON line {"cold_s", "warm_s", "covered"}.
"""
import json
import os
import subprocess
import sys
import tempfile

CHILD = r"""
import os, sys, time
sys.path.insert(0, os.environ["ONEPOSE_REPO"])
import numpy as np
import jax, jax.numpy as jnp
from onepose_tpu.utils.jax_cache import enable_persistent_cache
enable_persistent_cache(os.environ["ONEPOSE_CACHE_DIR"])

from onepose_tpu import serving
from onepose_tpu.datasets import anno
from onepose_tpu.models import gats_spg, superpoint

rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)
sp_params = superpoint.init_params(key)
gats_params = gats_spg.init_params(key)

def make_db(rng):
    P = 2000 - 8
    idxs = rng.integers(2, 10, P)
    total = int(idxs.sum())
    return anno.build_object_db(
        avg_keypoints3d=rng.uniform(-0.1, 0.1, (P, 3)).astype(np.float32),
        avg_descriptors3d=rng.normal(size=(256, P)).astype(np.float32),
        avg_scores3d=rng.uniform(0, 1, (P, 1)).astype(np.float32),
        clt_descriptors=rng.normal(size=(256, total)).astype(np.float32),
        clt_scores=rng.uniform(0, 1, (total, 1)).astype(np.float32),
        idxs=idxs, num_leaf=8, shape3d=2000)

n_objects = int(os.environ.get("ONEPOSE_CACHE_OBJECTS", "4"))
dbs = {f"obj{i:02d}": make_db(rng) for i in range(n_objects)}
server = serving.PoseServer(
    sp_params, gats_params, dbs, sp_config={"max_keypoints": 1024},
    batch_size=8, num_hypotheses=512, seed=1)

B, H, W = 8, 512, 512
K = np.array([[460.0, 0, W / 2], [0, 460.0, H / 2], [0, 0, 1]], np.float32)
img = rng.uniform(0, 1, (H, W)).astype(np.float32)
reqs = [serving.PoseRequest(f"obj{i % n_objects:02d}", img, K)
        for i in range(B)]
t0 = time.time()
server.infer_batch(reqs)   # compile + one exec
print(f"COMPILE_WALL_S={time.time() - t0:.1f}")
"""


def run_once(cache_dir: str, n_objects: int) -> float:
    env = dict(os.environ)
    env["ONEPOSE_REPO"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    env["ONEPOSE_CACHE_DIR"] = cache_dir
    env["ONEPOSE_CACHE_OBJECTS"] = str(n_objects)
    res = subprocess.run([sys.executable, "-c", CHILD], env=env,
                         capture_output=True, text=True, timeout=3600)
    for line in res.stdout.splitlines():
        if line.startswith("COMPILE_WALL_S="):
            return float(line.split("=", 1)[1])
    raise SystemExit(
        f"child failed (rc={res.returncode})\nstdout:\n{res.stdout}\n"
        f"stderr:\n{res.stderr[-3000:]}")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n-objects", type=int, default=4)
    ap.add_argument("--cache-dir", default=None,
                    help="default: a fresh temp dir (true cold start)")
    args = ap.parse_args()

    cache_dir = args.cache_dir or tempfile.mkdtemp(prefix="onepose_cc_")
    cold = run_once(cache_dir, args.n_objects)
    warm = run_once(cache_dir, args.n_objects)
    print(json.dumps({
        "metric": "serving_compile_cache_coverage",
        "n_objects": args.n_objects,
        "cold_s": round(cold, 1),
        "warm_s": round(warm, 1),
        "covered": bool(warm < cold * 0.3),
        "cache_dir": cache_dir,
    }))


if __name__ == "__main__":
    main()
