"""wseg_tpu: a TPU-native weakly-supervised semantic segmentation framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the PyTorch
reference `obeychoi0120/wseg` (pixel-to-prototype contrast WSSS, CVPR 2022):

* Stage 1 — SEAM + pixel-to-prototype contrastive training of a dilated
  ResNet-38 classifier; multi-scale+flip CAM seed inference with dense-CRF
  post-processing.
* Stage 2 — AffinityNet training on low/high-alpha CRF labels and random-walk
  CAM refinement.
* Stage 3 — DeepLab v1/v2(/v3/v3+) retraining on the pseudo masks with
  MSF+flip TTA and CRF.

Design is TPU-first: Flax models under jit/pjit over a `jax.sharding.Mesh`
(replacing DataParallel + SyncBN), static-shape masked formulations of the
reference's dynamic-shape losses, and Pallas kernels for the hot ops.
"""

__version__ = "0.3.0"  # kept in sync with pyproject.toml


def __getattr__(name):
    # lazy convenience exports (keep `import wseg_tpu` free of jax imports)
    if name == "build_model":
        from wseg_tpu.models import build_model

        return build_model
    if name == "MODELS":
        from wseg_tpu.utils.registry import MODELS

        return MODELS
    raise AttributeError(name)
