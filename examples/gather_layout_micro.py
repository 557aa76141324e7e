"""Row-gather rate vs table layout (round 4).

Hypothesis: gathering logical rows of a 2-D int16 [n, 2048] table pays
sublane-tiling amplification — a row is 1/16 of each of 16 (16,128)-tiles,
so the DMA moves ~16x the row bytes.  A tile-aligned 3-D view
[n, 16, 128] makes each row exactly one tile column (4 KB aligned block).

Times jnp.take of 4096 random rows from a 1.2M-row table in several
layouts, device-true.
"""

import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/granne_tpu_jax_cache")
from functools import partial
import jax.numpy as jnp
import numpy as np

n, width = 1_200_000, 2048
rng = np.random.default_rng(0)
ids0 = jnp.asarray(rng.integers(0, n, 4096).astype(np.int32))


def dev_time(tab, reshape_to=None, iters_pair=(8, 48)):
    @partial(jax.jit, static_argnames=("iters",))
    def run(t, ids, *, iters):
        def body(i, carry):
            ids_c, acc = carry
            rows = jnp.take(t, ids_c, axis=0)
            if reshape_to is not None:
                rows = rows.reshape((rows.shape[0],) + reshape_to)
            probe = jnp.sum(rows[0, :1].astype(jnp.float32) * 0.0)
            return ids0 + probe.astype(jnp.int32), acc + probe

        return jax.lax.fori_loop(0, iters, body, (ids, jnp.float32(0)))[1]

    lo, hi = iters_pair
    for it in (lo, hi):
        float(run(tab, ids0, iters=it))
    t0 = time.perf_counter(); float(run(tab, ids0, iters=lo)); tl = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(tab, ids0, iters=hi)); th = time.perf_counter() - t0
    return (th - tl) / (hi - lo)


# generate on device: host RNG for 4.9 GB + the H2D transfer takes many
# minutes on this 1-core VM (CLAUDE.md); device RNG is instant
base = jax.jit(
    lambda k: jax.random.randint(k, (n, width), -2**14, 2**14, jnp.int16),
)(jax.random.PRNGKey(0))
base.block_until_ready()
cases = [
    ("int16 [n, 2048]", base, None),
    ("int16 [n, 16, 128]", base.reshape(n, 16, 128), (2048,)),
    ("int32 [n, 1024]", jax.lax.bitcast_convert_type(base.reshape(n, 1024, 2), jnp.int32), None),
    ("int32 [n, 8, 128]", jax.lax.bitcast_convert_type(base.reshape(n, 1024, 2), jnp.int32).reshape(n, 8, 128), (1024,)),
]
for name, tab, rs in cases:
    t = dev_time(tab, rs)
    mb = 4096 * width * 2 / 1e6
    print(f"{name}: {t*1e6:.0f} us for {mb:.0f} MB -> {mb/1e3/t:.0f} GB/s eff", flush=True)
