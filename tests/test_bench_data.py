"""Round-trip tests for bench.py's real-dataset loaders and the swing guard.

The loaders cover the ANN-benchmarks file conventions (BASELINE configs
1-3): GloVe ``.txt(.gz)``, ``.fvecs``/``.bvecs`` (int32 dim header per
row), and ``.npy``.  Exactly the kind of row-bytes arithmetic that silently
truncates or transposes — each format is written synthetically and loaded
back for exact compare (VERDICT r3 #5).
"""

import gzip
import json
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def write_vecs(path, arr, dtype):
    """ANN-benchmarks *vecs convention: per row an int32 dim then the row."""
    n, d = arr.shape
    with open(path, "wb") as f:
        for row in arr:
            np.asarray([d], np.int32).tofile(f)
            row.astype(dtype).tofile(f)


@pytest.mark.parametrize("d", [1, 7, 100])
def test_fvecs_roundtrip(tmp_path, rng, d):
    arr = rng.standard_normal((23, d)).astype(np.float32)
    p = str(tmp_path / "base.fvecs")
    write_vecs(p, arr, np.float32)
    out = bench.load_dataset(p)
    np.testing.assert_array_equal(out, arr)
    np.testing.assert_array_equal(bench.load_dataset(p, max_rows=5), arr[:5])


@pytest.mark.parametrize("d", [1, 128])
def test_bvecs_roundtrip(tmp_path, rng, d):
    arr = rng.integers(0, 256, (17, d)).astype(np.uint8)
    p = str(tmp_path / "base.bvecs")
    write_vecs(p, arr, np.uint8)
    out = bench.load_dataset(p)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, arr.astype(np.float32))


def test_ivecs_gt_roundtrip(tmp_path, rng):
    gt = rng.integers(0, 1000, (9, 10)).astype(np.int32)
    p = str(tmp_path / "gt.ivecs")
    write_vecs(p, gt, np.int32)
    out = bench._load_vecs(p)
    np.testing.assert_array_equal(out, gt)


@pytest.mark.parametrize("gz", [False, True])
def test_glove_txt_roundtrip(tmp_path, rng, gz):
    arr = np.round(rng.standard_normal((11, 5)), 4).astype(np.float32)
    p = str(tmp_path / ("glove.txt.gz" if gz else "glove.txt"))
    op = gzip.open if gz else open
    with op(p, "wt") as f:
        for i, row in enumerate(arr):
            f.write(f"word{i} " + " ".join(repr(float(x)) for x in row) + "\n")
    out = bench.load_dataset(p)
    np.testing.assert_allclose(out, arr, rtol=1e-6)
    np.testing.assert_allclose(bench.load_dataset(p, max_rows=3), arr[:3], rtol=1e-6)


def test_npy_roundtrip(tmp_path, rng):
    arr = rng.standard_normal((13, 6)).astype(np.float32)
    p = str(tmp_path / "base.npy")
    np.save(p, arr)
    np.testing.assert_array_equal(bench.load_dataset(p), arr)
    np.testing.assert_array_equal(bench.load_dataset(p, max_rows=4), arr[:4])


def test_bench_data_smoke(tmp_path, rng):
    """End-to-end: bench.py --data on a generated .fvecs file must emit one
    JSON line whose metric names the dataset (VERDICT r3 #5)."""
    arr = rng.standard_normal((3000, 16)).astype(np.float32)
    p = str(tmp_path / "tiny.fvecs")
    write_vecs(p, arr, np.float32)
    env = dict(
        os.environ,
        GT_FORCE_PLATFORM="cpu",
        BENCH_QUERIES="256",
        BENCH_BATCH="256",
        BENCH_SKIP_HNSW="1",
        BENCH_TARGET_RECALL="0.5",
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"), "--data", p, "--max-rows", "2744"],
        capture_output=True, text=True, timeout=900, env=env, cwd=repo,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert "tiny.fvecs" in out["metric"]
    # 2744 base rows minus 256 held-out queries
    assert "n=2488" in out["metric"]
    assert out["value"] > 0
    assert "brute" in out["detail"]


# ---------------------------------------------------------------------------
# Swing guard (VERDICT r3 #8): r03's 7.8x build collapse must alarm.
# ---------------------------------------------------------------------------


def _load_round(name):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not present")
    with open(path) as f:
        data = json.load(f)
    if "parsed" in data:  # driver wrapper around the bench line
        data = data["parsed"]
    return data["detail"]


def test_swing_guard_reproduces_r03_alarm():
    r02 = _load_round("BENCH_r02.json")
    r03 = _load_round("BENCH_r03.json")
    alarms = bench.swing_alarms(r02, r03)
    assert any("hnsw.build_seconds" in a for a in alarms), alarms
    assert any("build_vectors_per_s" in a for a in alarms), alarms


def test_swing_guard_quiet_on_identical():
    r03 = _load_round("BENCH_r03.json")
    assert bench.swing_alarms(r03, r03) == []


def test_swing_guard_ignores_operating_knobs():
    old = {"hnsw": {"ef": 20, "qps": 100.0}}
    new = {"hnsw": {"ef": 120, "qps": 110.0}}
    assert bench.swing_alarms(old, new) == []
    assert bench.swing_alarms(old, {"hnsw": {"ef": 120, "qps": 500.0}}) != []
