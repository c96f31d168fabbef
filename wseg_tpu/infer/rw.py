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


# Per-dispatch pixel budget for the batched walk. With the slice-based pair
# affinities (no (N, D, P, C) gather temp in HBM, ops/pairs.py:
# pairwise_affinity_sliced) the HBM wall moved from the feature gather to the
# per-image dense (hw x hw) walk matrices: b96 at 384x512 is the measured-good
# working set (118.5 imgs/s vs 114.7 at b64, ROOFLINE.md 5d) while b128 OOMs
# on the transition-matrix temps, so any one dispatch is capped at 96*384*512
# padded pixels; larger buckets get proportionally smaller chunks
# (512x512 -> b72). This budget assumes pair_impl="sliced"; a model built
# with pair_impl="gather" re-materializes the 9.6 GB gather temp at b96, so
# RandomWalkRefiner drops to MAX_WALK_PX_GATHER (the measured-safe gather
# ceiling, b64 at 384x512) unless the caller overrides max_walk_px.
MAX_WALK_PX = 96 * 384 * 512
MAX_WALK_PX_GATHER = 64 * 384 * 512


class RandomWalkRefiner:
    def __init__(self, model, variables, beta: int = 8, logt: int = 6, bucket: int = 64,
                 mesh=None, max_walk_px: int | None = None,
                 matrix_impl: str = "scatter", walk_dtype=None):
        self.model = model
        self.beta = beta
        self.logt = logt
        self.bucket = bucket
        # walk_dtype=jnp.bfloat16 runs the T^(2^logt) squaring chain in bf16
        # (ops/random_walk.py); None = f32 (reference parity default)
        self.walk_dtype = walk_dtype
        # None = "unset": resolve to the measured-safe budget for the model's
        # pair implementation. An explicit caller value — even one equal to
        # MAX_WALK_PX — is honored as-is (no silent gather demotion).
        if max_walk_px is None:
            max_walk_px = (
                MAX_WALK_PX_GATHER
                if getattr(model, "pair_impl", "sliced") == "gather"
                else MAX_WALK_PX
            )
        self.max_walk_px = max_walk_px
        # dense-matrix construction inside the batched walk program:
        # "scatter" = .at[].add (reference's sparse to_dense semantics),
        # "banded" = scatter-free sum of masked diagonal bands — exactly
        # equal outputs (tests/test_pcm_pairs.py)
        self.matrix_impl = matrix_impl
        # mesh: shard refine_batch over the `data` axis (replica-parallel
        # stage-2 inference; the reference's aff_infer is strictly one image
        # on one GPU at a time)
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._data_sharding = NamedSharding(mesh, P("data"))
            variables = jax.device_put(variables, NamedSharding(mesh, P()))
        self.variables = variables

    @functools.lru_cache(maxsize=None)
    def _program(self, h: int, w: int):
        """Fused per-shape program: affinity matrix + random walk."""

        def f(variables, img, cam):
            aff_mat = self.model.apply(variables, img[None], to_dense=True)
            return random_walk_refine(cam, aff_mat, beta=self.beta, logt=self.logt,
                                      compute_dtype=self.walk_dtype)

        return jax.jit(f)

    @functools.lru_cache(maxsize=None)
    def _batch_program(self, ph: int, pw: int):
        """One jitted program refining a whole bucketed batch: batched
        affinity forward, per-image dense matrix + walk under vmap. Outputs
        are argmax-identical to per-image `refine_one` calls (pad-halo
        invariance, tests/test_bucket_padding.py)."""
        from wseg_tpu.ops.pairs import (
            dense_affinity_matrix,
            dense_affinity_matrix_banded,
            radius_pair_indices,
        )

        h8, w8 = ph // 8, pw // 8
        base_r = getattr(self.model, "radius", 5)
        min_edge = min(h8, w8)
        radius = (min_edge - 1) // 2 if min_edge < base_r * 2 + 1 else base_r
        ind_from_np, ind_to_np = radius_pair_indices(radius, (h8, w8))

        def f(variables, imgs, cams):
            aff = self.model.apply(variables, imgs)  # (B, D, P)
            ind_from = jnp.asarray(ind_from_np)
            ind_to = jnp.asarray(ind_to_np)

            def one(a, cam):
                if self.matrix_impl == "banded":
                    mat = dense_affinity_matrix_banded(a, radius, (h8, w8))
                else:
                    mat = dense_affinity_matrix(a, ind_from, ind_to, h8 * w8)
                return random_walk_refine(cam, mat, beta=self.beta, logt=self.logt,
                                          compute_dtype=self.walk_dtype)

            return jnp.argmax(jax.vmap(one)(aff, cams), axis=-1).astype(jnp.uint8)

        return jax.jit(f)

    def refine_batch(
        self, items: list[tuple[np.ndarray, np.ndarray]]
    ) -> list[np.ndarray]:
        """Data-parallel refinement of a batch of images: images are GROUPED
        by their own bucketed dims — each group's padding is identical to
        what per-image `refine_one` would use, so outputs match it exactly by
        construction (padding a small image up to a mixed-size chunk's max
        would instead route extra pad cells through the walk's transition
        matrix and the final interpolation row). Groups shard over the
        mesh's `data` axis when a mesh is set, and each dispatch is capped
        at `max_walk_px` padded pixels (mesh-multiple chunks) so large
        buckets cannot OOM the pair-gather temp.

        items: [(img_hwc, cam_full), ...]; returns the argmax pseudo masks
        [(H, W) uint8, ...] at original sizes."""
        mult = self.bucket or 8
        n_dev = 1 if self.mesh is None else self.mesh.devices.size

        groups: dict[tuple[int, int], list[int]] = {}
        for i, (im, _) in enumerate(items):
            key = (-(-im.shape[0] // mult) * mult, -(-im.shape[1] // mult) * mult)
            groups.setdefault(key, []).append(i)

        out: list[np.ndarray | None] = [None] * len(items)
        for (ph, pw), g_idxs in groups.items():
            # cap each dispatch at the pixel budget (mesh-multiple chunks)
            bmax = max(n_dev, self.max_walk_px // (ph * pw) // n_dev * n_dev)
            for s in range(0, len(g_idxs), bmax):
                idxs = g_idxs[s : s + bmax]
                b = len(idxs)
                b_pad = -(-b // n_dev) * n_dev
                imgs = np.zeros((b_pad, ph, pw, 3), np.float32)
                cams = np.zeros((b_pad, ph, pw, 21), np.float32)
                for j, i in enumerate(idxs + [idxs[-1]] * (b_pad - b)):
                    im, cam = items[i]
                    h, w = im.shape[:2]
                    imgs[j, :h, :w] = im
                    cams[j, :h, :w] = cam
                xb, cb = jnp.asarray(imgs), jnp.asarray(cams)
                if self.mesh is not None:
                    xb = jax.device_put(xb, self._data_sharding)
                    cb = jax.device_put(cb, self._data_sharding)
                preds = np.asarray(self._batch_program(ph, pw)(self.variables, xb, cb))
                for j, i in enumerate(idxs):
                    h, w = items[i][0].shape[:2]
                    out[i] = preds[j, :h, :w]
        return out

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
