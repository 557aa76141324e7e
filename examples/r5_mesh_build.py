"""Round-5 ask #2 (recorded): mesh-build wave cost vs single-chip, virtual-8.

The dp build path now has full lever parity (build_max_iters,
gather_budget, neighbor cache) and an on-device segment loop
(dp_waves_while).  This measures its per-wave cost against the single-chip
waves_while AT EQUAL SHAPES on the virtual 8-device CPU mesh: both arms
insert the same elements in W=1024 waves; the mesh arm shards the beam
(128 elements/device) and replicates the merge.

Reading the numbers (all 8 virtual devices timeshare one core): t8/t1
measures TOTAL work + mesh overhead, not latency.  The sharded beam does
~1x total beam work; the replicated merge does 8x; so the overhead-free
expectation is t8/t1 = (beam + 8*apply)/(beam + apply), and anything above
that is shard_map/collective tax.  The derived single-chip-equivalent
per-device wave cost is reported against the ~1.2x VERDICT bar.

Replaces the reference's rayon par_iter insertion
(/root/reference/src/index/mod.rs:756-782).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from granne_tpu import AngularVectors, BuildConfig
from granne_tpu.index import builder as B
from granne_tpu.index.graph import empty_layer, grow_layer
from granne_tpu.parallel import dp_build
from granne_tpu.parallel.mesh import make_mesh

N = int(os.environ.get("R5M_N", 65_536))
DIM = 64
M = 16
EF = 60
W = 1024
E = 4
MAX_ITERS = 20
WARM_TO = 16_384
SEG_WAVES = 8
CACHE = os.environ.get("R5M_CACHE", "1") == "1"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_warm(elements):
    """Shared prefix: host warm-up waves + fill to WARM_TO (single-chip)."""
    adj = jnp.copy(grow_layer(empty_layer(8, M), N))
    nbr_tab = None
    if CACHE:
        from granne_tpu.ops.nbr_cache import make_neighbor_cache

        nbr_tab = make_neighbor_cache(adj, elements, rows=N)
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
    if cur < WARM_TO:
        adj, nbr_tab = B.waves_while(
            (), adj, elements, cur, WARM_TO, wave_size=W, m_eff=M,
            max_search=EF, expand=E, reinsert=False, reverse_cap=16,
            merge_chunk=1024, max_iters=MAX_ITERS, nbr_tab=nbr_tab,
        )
    jnp.sum(adj).block_until_ready()
    return adj, nbr_tab


def main():
    log(f"devices: {len(jax.devices())}")
    rng = np.random.default_rng(42)
    vecs = rng.standard_normal((N, DIM)).astype(np.float32)
    elements = AngularVectors.from_raw(vecs)
    mesh = make_mesh(8)
    seg = W * SEG_WAVES
    kw = dict(wave_size=W, m_eff=M, max_search=EF, expand=E, reinsert=False,
              reverse_cap=16, merge_chunk=1024, max_iters=MAX_ITERS)

    results = {}
    for arm in ["single", "mesh"]:
        log(f"[{arm}] warm prefix...")
        adj, nbr_tab = build_warm(elements)
        cur = WARM_TO
        # compile the measured program on one segment
        if arm == "single":
            adj, nbr_tab = B.waves_while((), adj, elements, cur, cur + seg,
                                         nbr_tab=nbr_tab, **kw)
        else:
            adj, nbr_tab = dp_build.dp_waves_while(
                mesh, (), adj, elements, cur, cur + seg, nbr_tab=nbr_tab, **kw)
        jnp.sum(adj).block_until_ready()
        cur += seg
        times = []
        while cur + seg <= N:
            t0 = time.time()
            if arm == "single":
                adj, nbr_tab = B.waves_while((), adj, elements, cur, cur + seg,
                                             nbr_tab=nbr_tab, **kw)
            else:
                adj, nbr_tab = dp_build.dp_waves_while(
                    mesh, (), adj, elements, cur, cur + seg, nbr_tab=nbr_tab, **kw)
            jnp.sum(adj).block_until_ready()
            times.append((time.time() - t0) / SEG_WAVES)
            log(f"[{arm}] seg [{cur}..{cur + seg}): {times[-1] * 1e3:.0f} ms/wave")
            cur += seg
        results[arm] = float(np.median(times))
        del adj, nbr_tab

    t1, t8 = results["single"], results["mesh"]
    out = {
        "run": "r5_mesh_build", "n": N, "d": DIM, "wave": W, "cache": CACHE,
        "max_iters": MAX_ITERS,
        "single_ms_per_wave": round(t1 * 1e3, 1),
        "mesh8_ms_per_wave_virtual": round(t8 * 1e3, 1),
        "t8_over_t1": round(t8 / t1, 2),
        # virtual devices timeshare one core: t8 ~= total work.  The
        # per-device cost on real hardware is the sharded beam (1/8 of the
        # single-chip beam) plus the replicated merge (~= single-chip's).
        "note": "t8/t1 is total-work ratio; overhead-free expectation is "
                "(beam + 8*apply)/(beam + apply) given replicated merges",
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
