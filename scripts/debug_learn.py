"""Diagnose the e2e learning NaN: run contrast_train steps on the planted
synthetic set at several lrs, printing per-step losses to locate divergence.

CPU-only; run from repo root: python scripts/debug_learn.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_debug_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from tests.test_e2e_learning import _make_planted_voc


def main():
    tmp = Path(tempfile.mkdtemp(prefix="dbg_learn_"))
    root, train_list, eval_list, gt_dir, _ = _make_planted_voc(tmp)

    from wseg_tpu.data.voc12 import ContrastTrainDataset
    from wseg_tpu.models import build_model
    from wseg_tpu.train.contrast import TrainState, make_train_step
    from wseg_tpu.train.optim import label_params, poly_sgd

    crop, low, bs = 64, 32, 4
    ds = ContrastTrainDataset(
        train_list, root, crop_size=crop, min_long=64, max_long=80
    )
    model = build_model("contrast")
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, crop, crop, 3), jnp.float32))
    params, batch_stats = variables["params"], variables["batch_stats"]

    for lr in [float(a) for a in (sys.argv[1:] or [0.05, 0.01])]:
        max_step = len(ds) // bs * 16
        tx = poly_sgd(lr, 5e-4, max_step=max_step, labels=label_params(params))
        # fresh copies per lr: the jitted step donates its input buffers
        p = jax.tree.map(jnp.array, params)
        bs_ = jax.tree.map(jnp.array, batch_stats)
        state = TrainState(p, tx.init(p), bs_, rng)
        step = make_train_step(model, tx, low_res=low)
        rngn = np.random.RandomState(0)
        order = np.arange(len(ds))
        print(f"=== lr={lr} max_step={max_step} ===", flush=True)
        g = 0
        nan = False
        for ep in range(16):
            rngn.shuffle(order)
            for i in range(0, len(order) - bs + 1, bs):
                batch = [ds[int(j)] for j in order[i : i + bs]]
                img = jnp.asarray(np.stack([b[1] for b in batch]), jnp.float32)
                lab = jnp.asarray(np.stack([b[2] for b in batch]), jnp.float32)
                state, metrics = step(state, img, lab)
                g += 1
                m = {k: float(v) for k, v in metrics.items()}
                if g <= 4 or g % 12 == 0 or not np.isfinite(m["loss"]):
                    print(g, {k: round(v, 4) for k, v in m.items()}, flush=True)
                if not np.isfinite(m["loss"]):
                    print("NaN hit at step", g, flush=True)
                    nan = True
                    break
            if nan:
                break


if __name__ == "__main__":
    main()
