"""Multi-scale + flip CAM inference as batched XLA programs.

Rebuild of `contrast_infer.py:38-99`. The reference fans each image's 8 views
(scales {0.5, 1, 1.5, 2} x {orig, flip}) over a Python thread pool of GPU
replicas (:46-71); here the flip pair is one batch and each scale is one
jitted program, with shapes bucketed (padded up to a multiple) so the whole
VOC set reuses a handful of compiled programs. The stride-8 CAM is cropped to
the valid (unpadded) region, bilinearly upsampled to the original size
(align_corners=False like F.upsample at :62), flipped back, label-masked,
summed over views and min/max-normalized (:75-80).

Two paths:
* `CamInferencer.infer_one` — variable-size images (bucketed padding).
* `make_fused_msf_fn` — fixed-size fast path: ALL scales + fusion + upsample
  in ONE jitted program per shape; used by the benchmark and whenever the
  input pipeline produces uniform sizes.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from wseg_tpu.ops.cam import fuse_msf_cams
from wseg_tpu.ops.resize import (
    _composed_weights_np, _resize_weights_np, resize_bicubic, resize_bilinear,
    resize_bilinear_chain,
)

DEFAULT_SCALES = (0.5, 1.0, 1.5, 2.0)


def _ceil8(x: int) -> int:
    return -(-x // 8)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _np_upsample(cam: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """(h, w, C) -> (H, W, C) bilinear align_corners=False on host."""
    wh = _resize_weights_np(cam.shape[0], out_hw[0], False)
    ww = _resize_weights_np(cam.shape[1], out_hw[1], False)
    return np.einsum("oh,hwc->owc", wh, np.einsum("pw,hwc->hpc", ww, cam))


def _np_upsample_ac(cam: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """(h, w, C) -> (H, W, C) bilinear align_corners=True on host."""
    wh = _resize_weights_np(cam.shape[0], out_hw[0], True)
    ww = _resize_weights_np(cam.shape[1], out_hw[1], True)
    return np.einsum("oh,hwc->owc", wh, np.einsum("pw,hwc->hpc", ww, cam))


def _np_upsample_chain(
    cam: np.ndarray, mid_hw: tuple[int, int], out_hw: tuple[int, int]
) -> np.ndarray:
    """Composed stride-8 -> view (ac=True) -> orig (ac=False) upsample: one
    matmul pair instead of two (same linear map; at scale 2 the skipped
    view-size intermediate is 4x the output)."""
    wh = _composed_weights_np(cam.shape[0], mid_hw[0], out_hw[0], True, False)
    ww = _composed_weights_np(cam.shape[1], mid_hw[1], out_hw[1], True, False)
    return np.einsum("oh,hwc->owc", wh, np.einsum("pw,hwc->hpc", ww, cam))


class CamInferencer:
    """Variable-size MSF CAM inference with shape-bucketed compiled programs.

    device_msf=True moves the WHOLE per-image pipeline on device: one uint8
    image in (H*W*3 bytes instead of 8 float view tensors, ~64x less
    host->device traffic), PIL-equivalent bicubic view scaling
    (ops/resize.resize_bicubic, <=2/255 from PIL), normalization, both flips,
    all scales, fusion — one program per exact image size (best on hardware
    with a persistent compile cache)."""

    def __init__(self, model, variables, scales=DEFAULT_SCALES, bucket: int = 64,
                 device_msf: bool = False, mesh=None,
                 max_view_px: int | None = None):
        self.model = model
        self.scales = scales
        self.bucket = bucket  # pad H,W up to a multiple; None = exact shapes
        self.device_msf = device_msf
        # per-dispatch pixel cap for infer_batch (see MAX_VIEW_PX): large
        # batches of the big scales run as several device calls
        self.max_view_px = MAX_VIEW_PX if max_view_px is None else max_view_px
        # mesh: shard infer_batch over the `data` axis (replica-parallel
        # inference, the TPU-native replacement for the reference's
        # thread-pool-over-GPU-replicas at contrast_infer.py:46-71)
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._data_sharding = NamedSharding(mesh, P("data"))
            variables = jax.device_put(variables, NamedSharding(mesh, P()))
        self.variables = variables

    @functools.lru_cache(maxsize=None)
    def _forward(self, h: int, w: int, masked: bool = False):
        if masked:
            # bucketed path: valid_hw excludes the zero-pad halo from the
            # backbone, the CAM max and the PCM affinity, so the valid
            # region equals the exact-shape forward (ops/pcm.py,
            # models/resnet38.py valid_mask)
            def f(variables, imgs, valid_hw):
                _, cam_rv_down = self.model.apply(
                    variables, imgs, raw_cam=True, valid_hw=valid_hw
                )
                return cam_rv_down[..., 1:]
        else:
            def f(variables, imgs):
                # stride-8 PCM-refined CAM (inference consumes cam_rv,
                # contrast_infer.py:61-62); fg channels only
                _, cam_rv_down = self.model.apply(variables, imgs, raw_cam=True)
                return cam_rv_down[..., 1:]

        return jax.jit(f)

    @functools.lru_cache(maxsize=None)
    def _device_msf_program(self, h: int, w: int):
        from wseg_tpu.models.resnet38 import IMAGENET_MEAN, IMAGENET_STD

        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
        std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0

        def f(variables, img_u8, label):
            total = jnp.zeros((h, w, 20), jnp.float32)
            base = img_u8.astype(jnp.float32)
            for s in self.scales:
                th, tw = round(h * s), round(w * s)
                view = resize_bicubic(base, (th, tw))
                view = (view - mean) / std
                pair = jnp.stack([view, view[:, ::-1]])
                _, cam_rv_down = self.model.apply(variables, pair, raw_cam=True)
                cam = cam_rv_down[..., 1:].astype(jnp.float32)
                cam = resize_bilinear_chain(cam, (th, tw), (h, w))
                total = total + cam[0] + cam[1, :, ::-1]
            total = total * label[None, None, :]
            return fuse_msf_cams(jnp.transpose(total, (2, 0, 1)))

        return jax.jit(f)

    def infer_one_device(
        self, img_uint8: np.ndarray, label: np.ndarray
    ) -> np.ndarray:
        """img_uint8: (H, W, 3); returns the fused normalized fg CAM (20, H, W)."""
        h, w = img_uint8.shape[:2]
        return np.asarray(
            self._device_msf_program(h, w)(
                self.variables, jnp.asarray(img_uint8), jnp.asarray(label, jnp.float32)
            )
        )

    def infer_one(
        self, views: list[np.ndarray], label: np.ndarray, orig_hw: tuple[int, int]
    ) -> np.ndarray:
        """views: 8 HWC float32 arrays ([s, s_flip] per scale, already
        normalized); label: (20,); returns the fused normalized fg CAM
        (20, H, W)."""
        h0, w0 = orig_hw
        sum_cam = np.zeros((h0, w0, 20), np.float32)
        for si in range(len(views) // 2):
            pair = np.stack([views[2 * si], views[2 * si + 1]])  # (2, h, w, 3)
            h, w = pair.shape[1:3]
            if self.bucket:
                ph, pw = _round_up(h, self.bucket), _round_up(w, self.bucket)
                pair = np.pad(pair, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))
                valid = jnp.asarray([[h, w], [h, w]], jnp.int32)
                cam = np.asarray(
                    self._forward(ph, pw, True)(self.variables, pair, valid)
                )
            else:
                cam = np.asarray(self._forward(h, w)(self.variables, pair))
            cam = cam[:, : _ceil8(h), : _ceil8(w)]  # valid stride-8 region
            for i in range(2):
                # reference resize chain: stride-8 -> view size (a=True,
                # resnet38_contrast.py:57-58) -> original size (a=False, :62),
                # applied as ONE composed matmul pair
                up = _np_upsample_chain(cam[i], (h, w), (h0, w0))
                if i == 1:
                    up = up[:, ::-1]
                sum_cam += up
        sum_cam = sum_cam * label[None, None, :]
        sum_cam = np.transpose(sum_cam, (2, 0, 1))  # (20, H, W)
        return np.asarray(fuse_msf_cams(jnp.asarray(sum_cam)))

    def infer_batch(
        self, items: list[tuple[list[np.ndarray], np.ndarray, tuple[int, int]]]
    ) -> list[np.ndarray]:
        """Data-parallel MSF inference over a batch of images of DIFFERENT
        sizes: per scale, every image's flip pair is zero-padded into one
        bucketed batch with per-sample `valid_hw` masks (exact-forward
        equivalent, see models/resnet38.py), jitted once per padded shape and
        sharded over the mesh's `data` axis when a mesh is set. Outputs are
        identical to per-image `infer_one` calls.

        items: [(views, label, orig_hw), ...]; returns [fused (20, H, W), ...].
        """
        if not items:
            return []
        bucket = self.bucket or 8
        b = len(items)
        n_dev = 1 if self.mesh is None else self.mesh.devices.size
        # round the batch up to a multiple of the mesh size with repeats
        b_pad = _round_up(b, n_dev)
        padded_items = list(items) + [items[-1]] * (b_pad - b)

        sums = [np.zeros((*it[2], 20), np.float32) for it in items]
        for si in range(len(self.scales)):
            pairs = [
                np.stack([it[0][2 * si], it[0][2 * si + 1]]) for it in padded_items
            ]
            hs = [p.shape[1] for p in pairs]
            ws = [p.shape[2] for p in pairs]
            ph, pw = _round_up(max(hs), bucket), _round_up(max(ws), bucket)
            batch = np.zeros((b_pad * 2, ph, pw, 3), np.float32)
            valid = np.zeros((b_pad * 2, 2), np.int32)
            for i, p in enumerate(pairs):
                batch[2 * i : 2 * i + 2, : hs[i], : ws[i]] = p
                valid[2 * i : 2 * i + 2] = (hs[i], ws[i])
            # big-scale batches exceed the per-dispatch pixel cap (see
            # MAX_VIEW_PX) — run them as several equal device calls; each
            # chunk stays a multiple of the mesh size so sharding is unchanged
            n_chunks = _view_chunks(b_pad, ph, pw, self.max_view_px, n_dev)
            m = b_pad // n_chunks
            outs_dev = []
            for ci in range(n_chunks):
                xc = jnp.asarray(batch[2 * ci * m : 2 * (ci + 1) * m])
                vc = jnp.asarray(valid[2 * ci * m : 2 * (ci + 1) * m])
                if self.mesh is not None:
                    xc = jax.device_put(xc, self._data_sharding)
                    vc = jax.device_put(vc, self._data_sharding)
                outs_dev.append(self._forward(ph, pw, True)(self.variables, xc, vc))
            cam = np.concatenate([np.asarray(o) for o in outs_dev], axis=0)
            for i in range(b):
                h, w, (h0, w0) = hs[i], ws[i], items[i][2]
                cv = cam[2 * i : 2 * i + 2, : _ceil8(h), : _ceil8(w)]
                for j in range(2):
                    up = _np_upsample_chain(cv[j], (h, w), (h0, w0))
                    if j == 1:
                        up = up[:, ::-1]
                    sums[i] += up
        outs = []
        for i, (views, label, orig_hw) in enumerate(items):
            s = sums[i] * np.asarray(label)[None, None, :]
            s = np.transpose(s, (2, 0, 1))
            outs.append(np.asarray(fuse_msf_cams(jnp.asarray(s))))
        return outs


# Largest view-pixel volume (batch * 2 flips * h * w) one backbone dispatch
# may carry: 2*24*768*1024 is measured-good on the 16 GB chip, 2*32*768*1024
# OOMs on the scale-2 stem activations (scripts/batch_probe.py). Batches
# beyond this run as equal chunks under lax.map inside the same program —
# identical math, bounded working set.
MAX_VIEW_PX = 2 * 24 * 768 * 1024


def _view_chunks(b: int, h: int, w: int, max_px: int, chunk_mult: int = 1) -> int:
    """Number of equal batch chunks a (b, 2, h, w) view dispatch needs to
    stay under `max_px` pixels; always divides `b` evenly and keeps each
    chunk a multiple of `chunk_mult` (the mesh size for sharded dispatches).
    Best effort: if even a chunk of `chunk_mult` images (or one image) blows
    the cap, that smallest legal chunking is returned rather than looping."""
    n = max(1, -(-(b * 2 * h * w) // max_px))
    while n < b:
        if b % n == 0 and (b // n) % chunk_mult == 0:
            return n
        n += 1
    # single-image chunks (or the smallest mesh-multiple chunking)
    return b // chunk_mult if chunk_mult > 1 and b % chunk_mult == 0 else b


def make_fused_msf_fn(model, orig_hw: tuple[int, int], scales=DEFAULT_SCALES,
                      max_view_px: int = MAX_VIEW_PX):
    """Device-side MSF fusion as a pipeline of jitted programs: one per scale
    (forward + upsample align_corners=False + flip-back + flip-pair sum) and
    one fusion program (scale sum + label mask + min/max normalize).

    Splitting per scale keeps each XLA program small enough to compile fast
    and lets the per-scale dispatches overlap; JAX queues them back-to-back
    on the chip so there is no host sync until the final result.

    Wide batches improve small-view MXU utilization (scripts/batch_probe.py:
    scale 0.5 gains 13% per image from b16 to b64, scale 1.5 gains 4% at
    b32), while the scale-2 view OOMs past ~24 images — so a scale whose
    batch exceeds `max_view_px` pixels runs as equal chunks under `lax.map`
    within one program: full-batch dispatch efficiency for the small scales,
    chunked working set for the big ones.

    Returns fn(variables, views, label) with views = tuple over scales of
    (B, 2, h_s, w_s, 3), label (B, 20) -> (B, 20, H, W).
    """
    h0, w0 = orig_hw

    @jax.jit
    def per_scale(variables, v):
        b, two, h, w, _ = v.shape

        def fwd(pair):
            c, _, _, _, _ = pair.shape
            _, cam_rv_down = model.apply(
                variables, pair.reshape(c * 2, h, w, 3), raw_cam=True
            )
            # mixed precision: the backbone may run bf16, but the CAM resize/
            # fusion chain is numerically sensitive (max-norm of near-ties)
            # and cheap — always fuse in f32
            cam = cam_rv_down[..., 1:].astype(jnp.float32)
            # reference resize chain: stride-8 -> view (a=True) -> original
            # (a=False), composed into ONE matmul pair — skips the view-size
            # intermediate (4x the output at scale 2) entirely
            cam = resize_bilinear_chain(cam, (h, w), (h0, w0))
            cam = cam.reshape(c, 2, h0, w0, 20)
            cam = cam.at[:, 1].set(cam[:, 1, :, ::-1])
            return cam.sum(axis=1)

        n_chunks = _view_chunks(b, h, w, max_view_px)
        if n_chunks == 1:
            return fwd(v)
        chunked = jax.lax.map(fwd, v.reshape(n_chunks, b // n_chunks, *v.shape[1:]))
        return chunked.reshape(b, h0, w0, 20)

    @jax.jit
    def fuse(partials, label):
        total = sum(partials[1:], partials[0])
        total = total * label.astype(jnp.float32)[:, None, None, :]
        total = jnp.transpose(total, (0, 3, 1, 2))  # (B, 20, H, W)
        return jax.vmap(fuse_msf_cams)(total)

    def fn(variables, views, label):
        partials = tuple(per_scale(variables, v) for v in views)
        return fuse(partials, label)

    return fn


# ---------------------------------------------------------------------------
# Output writers — the file contracts consumed by stage 2 (bit-compatible
# with contrast_infer.py:82-99)
# ---------------------------------------------------------------------------


def save_cam_dict(out_dir: str, name: str, norm_cam: np.ndarray, label: np.ndarray):
    """{class_idx: (H, W) float32} for present classes -> <name>.npy."""
    os.makedirs(out_dir, exist_ok=True)
    cam_dict = {i: norm_cam[i] for i in range(20) if label[i] > 1e-5}
    np.save(os.path.join(out_dir, name + ".npy"), cam_dict)
    return cam_dict


def save_cam_pred(out_dir: str, name: str, norm_cam: np.ndarray, alpha: float = 0.26):
    """argmax png with constant bg score `alpha` (contrast_infer.py:92-99)."""
    import imageio

    os.makedirs(out_dir, exist_ok=True)
    bg = np.ones_like(norm_cam[:1]) * alpha
    pred = np.argmax(np.concatenate([bg, norm_cam], axis=0), axis=0).astype(np.uint8)
    imageio.imsave(os.path.join(out_dir, name + ".png"), pred)
    return pred
