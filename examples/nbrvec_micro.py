"""Microbench: fused neighbor-vector-table gather vs per-candidate gather.

Idea: replicate each node's M neighbors' vectors contiguously so the beam
issues ONE fat row gather per EXPANDED node instead of M separate d-vector
gathers per candidate.  Two table layouts are compared:

  v1 (flat):  bf16[n, pad128(M*d)]  — vectors packed back to back, row
              zero-padded to a 128-multiple; scoring slices off the pad and
              reshapes to [B, EM, d] (a lane-misaligned relayout).
  v2 (pervec): bf16[n, M*pad128(d)] — EACH vector zero-padded to 128 lanes;
              scoring reshapes (lane-aligned, free) to [B, EM, 128] and
              contracts against zero-padded queries — no relayout anywhere.

Also times the per-wave table maintenance (re-gather + scatter of ~21k
changed rows at W=1024, M=20, R=16).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/granne_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

from granne_tpu.ops import distance as D

n, d, W, M, E = int(os.environ.get("GT_N", 1_200_000)), 100, 1024, 20, 4
EM = E * M
DP = 128  # per-vector padded width (v2)
W1 = -(-(M * d) // 128) * 128  # flat row width (v1)
vecs = D.normalize(jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32))
adj = jax.random.randint(jax.random.PRNGKey(1), (n, M), 0, n, jnp.int32)
q = vecs[:W]
q128 = jnp.concatenate([q, jnp.zeros((W, DP - d), q.dtype)], axis=1)
rng = np.random.default_rng(0)
sel0 = jnp.asarray(rng.integers(0, n, (W, E)).astype(np.int32))
upd0 = jnp.asarray(rng.integers(0, n, (21504,)).astype(np.int32))

STEP = 100_000
n_pad = ((n + STEP - 1) // STEP) * STEP


MP = -(-M // 8) * 8  # tiled-layout row height (8-sublane DMA granularity)


def _build(layout):
    @jax.jit
    def build_table(vecs, adj):
        if layout == "v1":
            tab0 = jnp.zeros((n_pad, W1), jnp.bfloat16)
        elif layout == "v2":
            tab0 = jnp.zeros((n_pad, M * DP), jnp.bfloat16)
        else:  # tiled
            tab0 = jnp.zeros((n_pad, MP, DP), jnp.bfloat16)

        def body(i, tab):
            lo = i * STEP
            rows = jax.lax.dynamic_slice_in_dim(adj, lo, STEP, axis=0)
            g = jnp.take(vecs, jnp.clip(rows.reshape(-1), 0, n - 1), axis=0)
            g = g.astype(jnp.bfloat16).reshape(STEP, M, d)
            if layout == "v1":
                flat = g.reshape(STEP, M * d)
                flat = jnp.concatenate(
                    [flat, jnp.zeros((STEP, W1 - M * d), jnp.bfloat16)], axis=1
                )
            elif layout == "v2":
                gp = jnp.concatenate(
                    [g, jnp.zeros((STEP, M, DP - d), jnp.bfloat16)], axis=2
                )
                flat = gp.reshape(STEP, M * DP)
            else:
                gp = jnp.concatenate(
                    [g, jnp.zeros((STEP, M, DP - d), jnp.bfloat16)], axis=2
                )
                flat = jnp.concatenate(
                    [gp, jnp.zeros((STEP, MP - M, DP), jnp.bfloat16)], axis=1
                )
            return jax.lax.dynamic_update_slice_in_dim(tab, flat, lo, axis=0)

        return jax.lax.fori_loop(0, n_pad // STEP, body, tab0)

    t0 = time.time()
    tab = build_table(vecs, adj)
    _ = float(tab.reshape(-1)[0])
    print(f"table {layout} ({tab.nbytes/1e9:.1f} GB): {time.time()-t0:.1f}s", flush=True)
    return tab


def dev_time(op, args, iters_pair=(50, 2050)):
    @jax.jit
    def run(sel, iters, *args):
        def body(i, carry):
            sel_c, acc = carry
            probe = op(sel_c, *args)
            z = jnp.where(jnp.isfinite(probe), probe, 1.0).astype(jnp.float32) * 0.0
            return sel0 + z.astype(jnp.int32), acc + z

        return jax.lax.fori_loop(0, iters, body, (sel, jnp.float32(0)))[1]

    lo, hi = iters_pair
    for it in (lo, hi):
        float(run(sel0, jnp.int32(it), *args))
    t0 = time.perf_counter()
    float(run(sel0, jnp.int32(lo), *args))
    tl = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(sel0, jnp.int32(hi), *args))
    th = time.perf_counter() - t0
    return (th - tl) / (hi - lo)


def baseline(sel, adjv, vecsv):
    nbrs = jnp.take(adjv, jnp.clip(sel, 0, n - 1), axis=0).reshape(W, EM)
    g = jnp.take(vecsv, jnp.clip(nbrs.reshape(-1), 0, n - 1), axis=0).reshape(W, EM, d)
    cd = 1.0 - jnp.einsum("bkd,bd->bk", g, q)
    return cd[0, 0]


def fused_v1(sel, tab):
    g = jnp.take(tab, jnp.clip(sel, 0, n - 1), axis=0)[:, :, : M * d]
    g = g.reshape(W, EM, d)
    cd = 1.0 - jnp.einsum("bkd,bd->bk", g, q.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return cd[0, 0]


def fused_v2(sel, tab):
    g = jnp.take(tab, jnp.clip(sel, 0, n - 1), axis=0).reshape(W, EM, DP)
    cd = 1.0 - jnp.einsum("bkd,bd->bk", g, q128.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return cd[0, 0]


def fused_pallas(sel, tab3):
    from granne_tpu.ops.pallas.nbr_score import gather_score

    dots = gather_score(tab3, sel, q128.astype(jnp.bfloat16), M=M)
    return (1.0 - dots)[0, 0]


def table_update_v2(sel, adjv, vecsv, tab):
    rows = jnp.take(adjv, upd0, axis=0)
    g = jnp.take(vecsv, jnp.clip(rows.reshape(-1), 0, n - 1), axis=0)
    g = g.astype(jnp.bfloat16).reshape(-1, M, d)
    gp = jnp.concatenate([g, jnp.zeros((g.shape[0], M, DP - d), jnp.bfloat16)], axis=2)
    tab2 = tab.at[upd0].set(gp.reshape(-1, M * DP))
    return jnp.float32(tab2[0, 0]) + jnp.float32(sel[0, 0]) * 0.0


def _interleaved():
    """Decisive A/B: alternate XLA-v1 and pallas-tiled in ONE process so
    run-to-run environment variance cancels."""
    tab1 = _build("v1")
    tab3 = _build("tiled")
    for rep in range(3):
        t1 = dev_time(fused_v1, (tab1,))
        tp = dev_time(fused_pallas, (tab3,))
        print(f"rep{rep}: xla_v1={t1*1e6:.0f}us  pallas_tiled={tp*1e6:.0f}us  "
              f"ratio={t1/tp:.2f}x", flush=True)


if __name__ == "__main__":
    which = os.environ.get("GT_VARIANTS", "base,v1,v2,upd").split(",")
    if "base" in which:
        t = dev_time(baseline, (adj, vecs))
        print(f"baseline gather+dot (EM rows/query): {t*1e6:.0f}us/iter", flush=True)
    if "v1" in which:
        tab1 = _build("v1")
        t = dev_time(fused_v1, (tab1,))
        print(f"fused v1 flat (E rows/query):        {t*1e6:.0f}us/iter", flush=True)
        del tab1
    tab2 = None
    if {"v2", "upd"} & set(which):
        tab2 = _build("v2")
    if "v2" in which:
        t = dev_time(fused_v2, (tab2,))
        print(f"fused v2 pervec (E rows/query):      {t*1e6:.0f}us/iter", flush=True)
    if "upd" in which:
        t = dev_time(table_update_v2, (adj, vecs, tab2), iters_pair=(3, 13))
        print(f"table v2 update 21k rows: {t*1e3:.2f}ms/wave", flush=True)
    if "pallas" in which:
        del tab2
        tab3 = _build("tiled")
        t = dev_time(fused_pallas, (tab3,))
        print(f"fused pallas tiled (E rows/query):   {t*1e6:.0f}us/iter", flush=True)
    if "ab" in which:
        _interleaved()
