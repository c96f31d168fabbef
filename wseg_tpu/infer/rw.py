"""Random-walk CAM refinement driver (stage 2 inference).

Rebuild of `aff_infer.py:82-141`: per image, pad to /8, build the dense
affinity matrix from the AffinityNet forward, power+normalize into the
transition matrix, propagate the avg-pooled CAM, upsample, argmax, crop.
The matrix chain runs as one jitted TPU program (`random_walk_refine`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from wseg_tpu.ops.random_walk import random_walk_refine


class RandomWalkRefiner:
    def __init__(self, model, variables, beta: int = 8, logt: int = 6, bucket: int = 64):
        self.model = model
        self.variables = variables
        self.beta = beta
        self.logt = logt
        self.bucket = bucket

    @functools.lru_cache(maxsize=None)
    def _program(self, h: int, w: int):
        """Fused per-shape program: affinity matrix + random walk."""

        def f(variables, img, cam):
            aff_mat = self.model.apply(variables, img[None], to_dense=True)
            return random_walk_refine(cam, aff_mat, beta=self.beta, logt=self.logt)

        return jax.jit(f)

    def refine_one(self, img_hwc: np.ndarray, cam_full: np.ndarray) -> np.ndarray:
        """img_hwc: normalized (H, W, 3); cam_full: (H, W, 21) with bg filled.
        Returns the argmax pseudo mask (H, W) uint8 at the original size."""
        h, w = img_hwc.shape[:2]
        mult = self.bucket or 8
        ph = -(-h // mult) * mult
        pw = -(-w // mult) * mult
        img = np.pad(img_hwc, ((0, ph - h), (0, pw - w), (0, 0)))
        cam = np.pad(cam_full, ((0, ph - h), (0, pw - w), (0, 0)))
        cam_rw = np.asarray(self._program(ph, pw)(self.variables, img, cam))
        pred = np.argmax(cam_rw, axis=-1).astype(np.uint8)
        return pred[:h, :w]
