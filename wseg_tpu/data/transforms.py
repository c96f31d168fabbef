"""Host-side image transforms (PIL / numpy).

These preserve the reference pipeline's exact semantics (tool/imutils.py +
torchvision bits used in contrast_train.py:64-75): PIL bicubic resizing,
zero-padded random crop, torchvision-style ColorJitter. They run on CPU in
the input pipeline — image decode/augment is not TPU work. Output is HWC
float32 (NHWC batches), never CHW: the device side is channels-last.

Random transforms accept an optional `rng` (a `random.Random`): passing one
makes the sample's augmentation a pure function of that rng regardless of
thread scheduling — the deterministic input pipeline behind the
kill-and-`--resume` equivalence guarantee (cli/contrast_train.py). With
rng=None they draw from the global stream (reference-style behavior).
"""

from __future__ import annotations

import random

import numpy as np
import PIL.Image
import PIL.ImageEnhance

# PIL >= 10 removed the constant alias
_CUBIC = PIL.Image.BICUBIC


class RandomResizeLong:
    """Resize so the long side is uniform in [min_long, max_long]
    (tool/imutils.py:6-26)."""

    def __init__(self, min_long: int, max_long: int):
        self.min_long = min_long
        self.max_long = max_long

    def __call__(self, img: PIL.Image.Image, rng=None) -> PIL.Image.Image:
        target_long = (rng or random).randint(self.min_long, self.max_long)
        w, h = img.size
        if w < h:
            shape = (int(round(w * target_long / h)), target_long)
        else:
            shape = (target_long, int(round(h * target_long / w)))
        return img.resize(shape, resample=_CUBIC)


class RandomHorizontalFlip:
    def __call__(self, img, rng=None):
        if bool((rng or random).getrandbits(1)):
            if isinstance(img, PIL.Image.Image):
                return img.transpose(PIL.Image.FLIP_LEFT_RIGHT)
            return np.fliplr(img).copy()
        return img


class ColorJitter:
    """torchvision-equivalent ColorJitter (brightness/contrast/saturation/hue
    applied in random order with uniform factors)."""

    def __init__(self, brightness=0.3, contrast=0.3, saturation=0.3, hue=0.1):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue

    @staticmethod
    def _adjust_hue(img: PIL.Image.Image, factor: float) -> PIL.Image.Image:
        if factor == 0:
            return img
        h, s, v = img.convert("HSV").split()
        h_np = np.array(h, dtype=np.uint8)
        h_np = (h_np.astype(np.int16) + int(factor * 255)) % 256
        h = PIL.Image.fromarray(h_np.astype(np.uint8), "L")
        return PIL.Image.merge("HSV", (h, s, v)).convert("RGB")

    def __call__(self, img: PIL.Image.Image, rng=None) -> PIL.Image.Image:
        r = rng or random
        ops = []
        if self.brightness > 0:
            f = r.uniform(max(0, 1 - self.brightness), 1 + self.brightness)
            ops.append(lambda im, f=f: PIL.ImageEnhance.Brightness(im).enhance(f))
        if self.contrast > 0:
            f = r.uniform(max(0, 1 - self.contrast), 1 + self.contrast)
            ops.append(lambda im, f=f: PIL.ImageEnhance.Contrast(im).enhance(f))
        if self.saturation > 0:
            f = r.uniform(max(0, 1 - self.saturation), 1 + self.saturation)
            ops.append(lambda im, f=f: PIL.ImageEnhance.Color(im).enhance(f))
        if self.hue > 0:
            f = r.uniform(-self.hue, self.hue)
            ops.append(lambda im, f=f: self._adjust_hue(im, f))
        r.shuffle(ops)
        for op in ops:
            img = op(img)
        return img


class Normalize:
    """uint8 HWC -> normalized float32 (network/resnet38d.py:104-118)."""

    def __init__(self, mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, img) -> np.ndarray:
        arr = np.asarray(img, dtype=np.float32) / 255.0
        return (arr - self.mean) / self.std


class RandomCrop:
    """Random crop with zero-pad-to-size semantics for small images
    (tool/imutils.py:29-67). Optionally crops aligned secondary arrays."""

    def __init__(self, cropsize: int):
        self.cropsize = cropsize

    def get_box(self, h: int, w: int, rng=None):
        r = rng or random
        ch = min(self.cropsize, h)
        cw = min(self.cropsize, w)
        w_space = w - self.cropsize
        h_space = h - self.cropsize
        if w_space > 0:
            cont_left, img_left = 0, r.randrange(w_space + 1)
        else:
            cont_left, img_left = r.randrange(-w_space + 1), 0
        if h_space > 0:
            cont_top, img_top = 0, r.randrange(h_space + 1)
        else:
            cont_top, img_top = r.randrange(-h_space + 1), 0
        return cont_top, cont_left, img_top, img_left, ch, cw

    def apply(self, arr: np.ndarray, box) -> np.ndarray:
        cont_top, cont_left, img_top, img_left, ch, cw = box
        out = np.zeros((self.cropsize, self.cropsize, arr.shape[-1]), np.float32)
        out[cont_top : cont_top + ch, cont_left : cont_left + cw] = arr[
            img_top : img_top + ch, img_left : img_left + cw
        ]
        return out

    def __call__(self, arr: np.ndarray, rng=None) -> np.ndarray:
        h, w = arr.shape[:2]
        return self.apply(arr, self.get_box(h, w, rng))


class CenterCrop:
    """Center crop with constant padding (tool/imutils.py:160-198)."""

    def __init__(self, cropsize: int, default_value=0):
        self.cropsize = cropsize
        self.default_value = default_value

    def __call__(self, npimg: np.ndarray) -> np.ndarray:
        h, w = npimg.shape[:2]
        ch = min(self.cropsize, h)
        cw = min(self.cropsize, w)
        sh = h - self.cropsize
        sw = w - self.cropsize
        cont_left, img_left = (0, int(round(sw / 2))) if sw > 0 else (int(round(-sw / 2)), 0)
        cont_top, img_top = (0, int(round(sh / 2))) if sh > 0 else (int(round(-sh / 2)), 0)
        shape = (
            (self.cropsize, self.cropsize)
            if npimg.ndim == 2
            else (self.cropsize, self.cropsize, npimg.shape[2])
        )
        out = np.full(shape, self.default_value, npimg.dtype)
        out[cont_top : cont_top + ch, cont_left : cont_left + cw] = npimg[
            img_top : img_top + ch, img_left : img_left + cw
        ]
        return out


class AvgPool2d:
    """Non-overlapping mean pool on HWC numpy (tool/imutils.py:130-138)."""

    def __init__(self, ksize: int):
        self.ksize = ksize

    def __call__(self, img: np.ndarray) -> np.ndarray:
        k = self.ksize
        h, w = img.shape[:2]
        th, tw = h - h % k, w - w % k
        # pad up like block_reduce if not divisible
        if h % k or w % k:
            ph, pw = (k - h % k) % k, (k - w % k) % k
            img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="constant")
            h, w = img.shape[:2]
        return img.reshape(h // k, k, w // k, k, -1).mean(axis=(1, 3))


def msf_views(
    img: PIL.Image.Image, scales, unit: int = 1
) -> list[np.ndarray]:
    """Multi-scale + flip view list (voc12/data.py:100-121): for each scale,
    PIL-bicubic resize of the (unit-rounded) image, then [view, flipped].
    Returns raw uint8 HWC arrays (normalize separately)."""
    rounded = (
        int(round(img.size[0] / unit) * unit),
        int(round(img.size[1] / unit) * unit),
    )
    out = []
    for s in scales:
        target = (round(rounded[0] * s), round(rounded[1] * s))
        s_img = np.asarray(img.resize(target, resample=_CUBIC))
        out.append(s_img)
        out.append(np.flip(s_img, axis=1).copy())
    return out
