"""Round-5 ask #3: settle Pallas candidate B at the build shape.

Evidence so far: the fused flat scorer (ops/pallas/nbr_score
gather_score_flat — per-row HBM->VMEM DMA double-buffered across grid
steps, score fused) wins 1.20-1.26x over XLA gather+einsum at the
W=1024 x E=4 build shape IN ISOLATION (BASELINE round-2 study), but loses
5.4x end-to-end at serve shapes (E=1: Mosaic per-grid-step overhead
dominates, round-3 study).  The missing measurement — and the cheapest
decisive test of candidate B's premise — is the fused kernel INSIDE the
real build wave at the winning shape: beam_micro shows the beam's other
ops (dedupe, merge, select) measure below noise, so if fusing the
gather+score into one kernel does not move the wave, there is nothing
left for the bigger candidate-B kernel (beam state resident in VMEM) to
save either, and the question closes.

Method: one 1.2M build's bottom layer, alternating 64-wave segments
between pallas_flat="0" (XLA) and "tpu" (fused kernel) — same process,
interleaved, so host-load drift cancels (CLAUDE.md A/B rule).  Reports
per-wave seconds for each arm and the ratio.

Hot loop being attacked: the batched form of
/root/reference/src/index/mod.rs:999-1037.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("GT_FORCE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GT_FORCE_PLATFORM"])
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/granne_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

from granne_tpu import AngularVectors, BuildConfig
from granne_tpu.index import builder as B
from granne_tpu.index.graph import empty_layer, grow_layer
from granne_tpu.ops import distance as D
from granne_tpu.ops.nbr_cache import make_neighbor_cache

N = int(os.environ.get("R5P_N", 1_200_000))
DIM = 100
M = 20
EF = 100
W = 1024
E = 4
MAX_ITERS = 32
SEG_WAVES = 64
WARM_TO = int(os.environ.get("R5P_WARM", 300_000))
MODES = ["0", "tpu" if not os.environ.get("GT_FORCE_PLATFORM") else "interpret"]


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(42)
    centers = rng.standard_normal((1000, DIM)).astype(np.float32)
    vecs = (centers[rng.integers(0, 1000, N)]
            + 0.35 * rng.standard_normal((N, DIM))).astype(np.float32)
    elements = AngularVectors.from_raw(vecs)

    adj = grow_layer(empty_layer(8, M), N)
    adj = jnp.copy(adj)
    nbr_tab = make_neighbor_cache(adj, elements, rows=N)
    kw = dict(wave_size=W, m_eff=M, max_search=EF, expand=E, reinsert=False,
              reverse_cap=16, merge_chunk=1024, max_iters=MAX_ITERS)

    def force(a):
        float(jnp.sum(a[:: max(1, a.shape[0] // 64)]))

    # geometric warm-up (host waves) then fill to WARM_TO, XLA path,
    # compiling BOTH arms' waves_while before any timed segment
    cur = 0
    for lo, hi, bucket in B._wave_ranges(0, min(W, WARM_TO), W):
        if hi - lo >= W:
            break
        ids = np.full((bucket,), 0, np.int32)
        ids[: hi - lo] = np.arange(lo, hi, dtype=np.int32)
        valid = np.zeros((bucket,), bool)
        valid[: hi - lo] = True
        adj, nbr_tab = B.wave_step(
            (), adj, elements, jnp.asarray(ids), jnp.asarray(valid),
            m_eff=M, max_search=EF, expand=E, reinsert=False, reverse_cap=16,
            merge_chunk=1024, max_iters=MAX_ITERS, nbr_tab=nbr_tab,
        )
        cur = hi
    log("warm-up waves done; compiling both arms...")
    for mode in MODES:
        adj, nbr_tab = B.waves_while(
            (), adj, elements, cur, cur + W * 2, nbr_tab=nbr_tab,
            pallas_flat=mode, **kw)
        force(adj)
        cur += W * 2
    while cur < WARM_TO:
        hi = min(WARM_TO, cur + W * 128)
        adj, nbr_tab = B.waves_while(
            (), adj, elements, cur, hi, nbr_tab=nbr_tab, pallas_flat="0", **kw)
        cur = hi
    force(adj)
    log(f"graph warm to {cur}; starting interleaved segments")

    # interleaved timed segments
    seg = W * SEG_WAVES
    times = {m: [] for m in MODES}
    i = 0
    while cur + seg <= N:
        mode = MODES[i % 2]
        t0 = time.time()
        adj, nbr_tab = B.waves_while(
            (), adj, elements, cur, cur + seg, nbr_tab=nbr_tab,
            pallas_flat=mode, **kw)
        force(adj)
        dt = time.time() - t0
        times[mode].append(dt / SEG_WAVES)
        log(f"seg {i} [{cur}..{cur + seg}) mode={mode}: {dt:.2f}s "
            f"({dt / SEG_WAVES * 1e3:.1f} ms/wave)")
        cur += seg
        i += 1

    # drop the first pair (cache effects) if we have enough
    res = {}
    for m in MODES:
        ts = times[m][1:] if len(times[m]) > 2 else times[m]
        res[m] = {"ms_per_wave_mean": round(1e3 * float(np.mean(ts)), 2),
                  "ms_per_wave_med": round(1e3 * float(np.median(ts)), 2),
                  "segments": len(times[m])}
    ratio = res[MODES[0]]["ms_per_wave_med"] / max(res[MODES[1]]["ms_per_wave_med"], 1e-9)
    out = {"run": "r5_pallas_build", "n": N, "wave": W, "expand": E,
           "max_iters": MAX_ITERS, "xla": res[MODES[0]], "pallas": res[MODES[1]],
           "pallas_speedup_xla_over_pallas": round(ratio, 3)}
    # sanity: the mixed-arm graph is searchable (parity is separately
    # asserted by interpret-mode tests + the r3 in-loop overlap study)
    from granne_tpu.ops import frontier
    sample = np.random.default_rng(0).integers(0, cur, 2048)
    q = elements.queries_from_ids(jnp.asarray(sample.astype(np.int32)))
    ids, _ = frontier.beam_search(adj, elements, q, jnp.zeros((2048,), jnp.int32), ef=20)
    out["self_recall_at1"] = round(float(np.mean(np.asarray(ids)[:, 0] == sample)), 4)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
