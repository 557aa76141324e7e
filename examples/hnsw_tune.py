"""HNSW serving-point tuner: build (or load cached) a big graph once, then
sweep serve configs — element dtype x expand x ef x max_iters — against
EXACT f32 ground truth, printing recall/QPS per point.

Artifacts cache to --dir so repeat invocations skip the build.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/granne_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_200_000)
    p.add_argument("--d", type=int, default=100)
    p.add_argument("--m", type=int, default=30)
    p.add_argument("--build-ef", type=int, default=200)
    p.add_argument("--wave", type=int, default=256)
    p.add_argument("--queries", type=int, default=4096)
    p.add_argument("--dir", default="/tmp/gt_hnsw_tune")
    p.add_argument("--dtypes", default="f32,bf16,i8")
    p.add_argument("--expands", default="2,4")
    p.add_argument("--efs", default="30,40,60,80")
    p.add_argument("--iters", default="", help="comma list of explicit max_iters (overrides default pair)")
    p.add_argument("--descent-ef", type=int, default=1, dest="descent_ef")
    p.add_argument("--target", type=float, default=0.95)
    p.add_argument("--serve-cache", action="store_true",
                   help="serve through a bottom-layer neighbor-vector cache (ops.nbr_cache)")
    p.add_argument("--build-cache", action="store_true",
                   help="build with BuildConfig(neighbor_cache=True)")
    args = p.parse_args()

    from granne_tpu import AngularIntVectors, AngularVectors, BuildConfig, build_layers
    from granne_tpu.index import io as gio
    from granne_tpu.models.brute import exact_topk
    from granne_tpu.ops import distance as Dops
    from granne_tpu.ops import frontier

    os.makedirs(args.dir, exist_ok=True)
    tag = f"n{args.n}_d{args.d}_m{args.m}_ef{args.build_ef}"
    idx_path = os.path.join(args.dir, f"{tag}.idx")
    el_path = os.path.join(args.dir, f"{tag}.el")
    gt_path = os.path.join(args.dir, f"{tag}_gt.npy")

    rng = np.random.default_rng(42)
    n_clusters = 1000
    centers = rng.standard_normal((n_clusters, args.d)).astype(np.float32)
    assign = rng.integers(0, n_clusters, args.n)
    vecs = (centers[assign] + 0.35 * rng.standard_normal((args.n, args.d))).astype(np.float32)
    queries = (
        centers[rng.integers(0, n_clusters, args.queries)]
        + 0.35 * rng.standard_normal((args.queries, args.d))
    ).astype(np.float32)

    elements = AngularVectors.from_raw(vecs)
    del vecs
    qd = jax.device_put(Dops.normalize(jnp.asarray(queries)))

    if os.path.exists(idx_path):
        print("loading cached graph...", flush=True)
        layers = gio.load_index(idx_path)
    else:
        print(f"building hnsw n={args.n} M={args.m} ef={args.build_ef}...", flush=True)
        t0 = time.time()
        cfg = BuildConfig(num_neighbors=args.m, max_search=args.build_ef,
                          wave_size=args.wave, expand=4,
                          neighbor_cache=args.build_cache)
        layers = build_layers(elements, cfg)
        for a in layers.layers:  # force execution (lazy backend)
            float(jnp.sum(a[:: max(1, a.shape[0] // 64)]))
        dt = time.time() - t0
        print(f"build: {dt:.1f}s = {args.n/dt:.0f} vec/s", flush=True)
        gio.save_index(layers, idx_path)

    if os.path.exists(gt_path):
        gt = np.load(gt_path)
    else:
        print("computing exact f32 ground truth...", flush=True)
        gt = np.asarray(exact_topk(elements.vectors, qd, 10)[0])
        np.save(gt_path, gt)

    containers = {}
    for dt_name in args.dtypes.split(","):
        if dt_name == "f32":
            containers["f32"] = (elements, elements.prepare_queries(qd))
        elif dt_name == "bf16":
            el = elements.as_bf16()
            containers["bf16"] = (el, el.prepare_queries(qd))
        elif dt_name == "i8":
            # quantize on device (no 480MB D2H round-trip over the tunnel)
            el = AngularIntVectors.from_quantized(Dops.quantize_i8(elements.vectors))
            containers["i8"] = (el, el.prepare_queries(qd))

    def recall(ids):
        ids = np.asarray(ids)
        return float(np.mean([len(set(ids[i]) & set(gt[i])) / 10 for i in range(len(gt))]))

    from functools import partial

    def qps(step_fn, q, captures, reps=12, lo=4):
        """Device-true QPS: chained in-jit loop + forced scalar fetch,
        differencing two iteration counts (block_until_ready is lazy on
        the tunnel backend — see bench.py timed_qps).  ``captures`` holds
        the big arrays (graph, elements) as ARGUMENTS — closing over them
        would embed them as constants in the remote-compile request
        (HTTP 413)."""

        @partial(jax.jit, static_argnames=("iters",))
        def chain(q0, caps, *, iters):
            def body(i, carry):
                qq, acc = carry
                _ids, d = step_fn(qq, caps)
                probe = d.reshape(-1)[0]
                z = jnp.where(jnp.isfinite(probe), probe, 1.0) * 0.0
                qq = jax.tree_util.tree_map(lambda leaf: leaf + z.astype(leaf.dtype), q0)
                return qq, acc + z
            return jax.lax.fori_loop(0, iters, body, (q0, jnp.float32(0)))[1]

        float(chain(q, captures, iters=lo))
        float(chain(q, captures, iters=reps))
        t0 = time.time()
        float(chain(q, captures, iters=lo))
        t_lo = time.time() - t0
        t0 = time.time()
        float(chain(q, captures, iters=reps))
        t_hi = time.time() - t0
        return args.queries * (reps - lo) / max(t_hi - t_lo, 1e-9)

    _tabs = {}
    print(f"{'dtype':6s} {'E':>2s} {'ef':>4s} {'iters':>6s} {'recall@10':>10s} {'QPS':>10s}")
    for name, (el, q) in containers.items():
        for E in [int(x) for x in args.expands.split(",")]:
            for ef in [int(x) for x in args.efs.split(",")]:
                iter_list = (
                    [int(x) for x in args.iters.split(",")]
                    if args.iters
                    else [None, max(4, int(1.2 * ef / E) + 2)]
                )
                for iters in iter_list:
                    fn = lambda qq, caps, ef=ef, E=E, iters=iters: frontier.search_layers(
                        caps[0], caps[1], qq, ef=ef, num_neighbors=10, expand=E,
                        max_iters=iters, descent_ef=args.descent_ef,
                        nbr_vecs=caps[2] if len(caps) > 2 else None,
                    )
                    caps = (layers.layers, el)
                    if args.serve_cache:
                        from granne_tpu.ops.nbr_cache import make_neighbor_cache, supports_cache
                        if supports_cache(el):
                            if name not in _tabs:
                                _tabs[name] = make_neighbor_cache(
                                    layers.layers[-1], el, rows=args.n
                                )
                            caps = (layers.layers, el, _tabs[name])
                    rec = recall(fn(q, caps)[0])
                    rate = qps(fn, q, caps) if rec >= args.target else float("nan")
                    it_s = "dflt" if iters is None else str(iters)
                    print(f"{name:6s} {E:2d} {ef:4d} {it_s:>6s} {rec:10.4f} {rate:10,.0f}",
                          flush=True)


if __name__ == "__main__":
    main()
