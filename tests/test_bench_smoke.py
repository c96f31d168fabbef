"""Smoke tests for the driver-facing artifacts: bench.py and
__graft_entry__.entry().

The driver runs `python bench.py` on the real chip at the end of every round
and compile-checks `entry()` — a crash in either means the round records no
benchmark / fails the gate. These tests drive both code paths end-to-end on
the CPU platform with tiny shapes so a refactor can't silently break them.
(`dryrun_multichip` has its own in-suite gate, tests/test_train_step.py.)
"""

import io
import json
import sys
from contextlib import redirect_stdout

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # full-model compiles (~3 min total)


def _run_bench(argv):
    import bench

    old = sys.argv
    sys.argv = ["bench.py"] + argv
    buf = io.StringIO()
    try:
        with redirect_stdout(buf):
            bench.main()
    finally:
        sys.argv = old
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1, f"bench must print ONE JSON line, got: {lines}"
    return json.loads(lines[0])


def _cache_args():
    # keep bench's cache redirect inside the per-machine test cache dir
    import os

    return ["--cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]]


def test_bench_cam_smoke():
    """Headline mode end-to-end, including the reference-style baseline loop
    (the likelier crash site: per-view jit cache, fuse_ref, per-image
    timing), at tiny shapes with 1 baseline rep."""
    result = _run_bench(
        ["--height", "48", "--width", "64", "--batch", "1", "--iters", "1",
         "--warmup", "0", "--baseline_reps", "1"] + _cache_args()
    )
    assert result["metric"] == "CAM imgs/sec/chip (ms+flip infer)"
    assert result["unit"] == "imgs/sec/chip"
    assert result["value"] > 0
    assert result["vs_baseline"] is not None and result["vs_baseline"] > 0
    d = result["detail"]
    assert d["baseline_img_samples"] == 1
    assert d["relay_rtt_ms"]["median"] >= 0
    assert d["physical_ceiling_ips"] > 0


def test_bench_train_smoke():
    result = _run_bench(
        ["--mode", "train", "--height", "32", "--batch", "2", "--iters", "1",
         "--warmup", "0"] + _cache_args()
    )
    assert result["metric"] == "train imgs/sec/chip (stage-1 dual-view step)"
    assert result["value"] > 0
    assert jnp.isfinite(result["detail"]["loss0"])


def test_graft_entry_jits():
    import __graft_entry__ as g

    fn, (variables, x) = g.entry()
    # driver contract: fn must be jittable on a single device
    cam = jax.jit(fn)(variables, x)
    assert cam.ndim == 4 and all(s > 0 for s in cam.shape)
    assert bool(jnp.all(jnp.isfinite(cam.astype(jnp.float32))))
