"""pydensecrf-vs-native cross-validation — ready to run the moment the
environment provides pydensecrf (VERDICT r3 "what's missing" item 3 /
"next round" item 8).

The reference's actual CRF dependency (`requirements.txt:3`) is not
installable here, so our first-party C++ permutohedral CRF is validated
against an O(n^2) from-the-paper dense mean-field oracle instead
(tests/test_crf_oracle.py). This script closes the remaining gap whenever
pydensecrf IS present: it runs BOTH implementations on the same synthetic
images at all three reference call-site parameterizations —

  * contrast_infer.py:115-126 label-unary (sxy 3/50, srgb 5, 10 iters)
  * aff_prepare.py:34-50 label-unary (sxy 3/80, srgb 13, 10 iters)
  * segmentation/lib/utils/DenseCRF.py:5-39 softmax-unary (sxy 3/32,
    srgb 13, 1 iter)

— and reports per-regime max |marginal diff| and argmax agreement, failing
(exit 1) if agreement drops below 99% anywhere. Self-skips (exit 0 with a
notice) when pydensecrf is absent.

Usage:  python scripts/compare_pydensecrf.py [--size 96 128] [--seed 0]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

from wseg_tpu.ops import densecrf as native  # noqa: E402


def _pydensecrf_run(img, unary, t, sxy_g, compat_g, sxy_b, srgb, compat_b,
                    n_labels):
    import pydensecrf.densecrf as dcrf

    h, w = img.shape[:2]
    d = dcrf.DenseCRF2D(w, h, n_labels)
    d.setUnaryEnergy(np.ascontiguousarray(unary.T).astype(np.float32))
    d.addPairwiseGaussian(sxy=sxy_g, compat=compat_g)
    d.addPairwiseBilateral(
        sxy=sxy_b, srgb=srgb, rgbim=np.ascontiguousarray(img), compat=compat_b
    )
    q = d.inference(t)
    return np.array(q).reshape(n_labels, h, w)


REGIMES = [
    # (name, unary kind, t, sxy_g, compat_g, sxy_b, srgb, compat_b)
    ("contrast_infer label-unary", "label", 10, 3, 3, 50, 5, 10),
    ("aff_prepare label-unary", "label", 10, 3, 3, 80, 13, 10),
    ("seg DenseCRF softmax-unary", "softmax", 1, 3, 3, 32, 13, 10),
]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, nargs=2, default=(96, 128))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n_labels", type=int, default=21)
    args = p.parse_args(argv)

    try:
        import pydensecrf.densecrf  # noqa: F401
    except ImportError:
        print(
            "pydensecrf is not installed in this environment — nothing to "
            "compare. (Our CRF is oracle-validated in "
            "tests/test_crf_oracle.py; install pydensecrf and re-run this "
            "script for the bit-level reference cross-check.)"
        )
        return 0

    h, w = args.size
    rng = np.random.RandomState(args.seed)
    # piecewise-constant color regions + noise: the regime CRFs act on
    img = np.zeros((h, w, 3), np.uint8)
    img[:, : w // 2] = (40, 200, 60)
    img[: h // 2, w // 2 :] = (200, 60, 40)
    img[h // 2 :, w // 2 :] = (60, 60, 200)
    img = np.clip(
        img.astype(np.int32) + rng.randint(-25, 25, img.shape), 0, 255
    ).astype(np.uint8)

    labels = np.zeros((h, w), np.int64)
    labels[:, : w // 2] = 3
    labels[: h // 2, w // 2 :] = 7
    # bottom-right stays 0 (bg); add salt noise so the CRF has work to do
    flip = rng.rand(h, w) < 0.08
    labels[flip] = rng.randint(0, args.n_labels, flip.sum())

    probs = rng.dirichlet(np.ones(args.n_labels) * 0.4, size=(h, w))
    probs = np.ascontiguousarray(probs.transpose(2, 0, 1)).astype(np.float32)

    worst = 1.0
    for name, kind, t, sxy_g, compat_g, sxy_b, srgb, compat_b in REGIMES:
        if kind == "label":
            unary = native.unary_from_labels(labels, args.n_labels, 0.7)
            ours = native.crf_inference_labels(
                img, labels, t=t, n_labels=args.n_labels, gt_prob=0.7,
                sxy_gaussian=sxy_g, compat_gaussian=compat_g,
                sxy_bilateral=sxy_b, srgb=srgb, compat_bilateral=compat_b,
            )
        else:
            unary = native.unary_from_softmax(probs)
            ours = native.crf_inference_softmax(
                img, probs, t=t, labels=args.n_labels,
                sxy_gaussian=sxy_g, compat_gaussian=compat_g,
                sxy_bilateral=sxy_b, srgb=srgb, compat_bilateral=compat_b,
            )
        theirs = _pydensecrf_run(
            img, unary, t, sxy_g, compat_g, sxy_b, srgb, compat_b,
            args.n_labels,
        )
        diff = np.abs(ours - theirs).max()
        agree = (ours.argmax(0) == theirs.argmax(0)).mean()
        worst = min(worst, agree)
        print(
            f"{name:32s}  max|dQ|={diff:.3e}  argmax agreement={agree:.4%}"
        )

    if worst < 0.99:
        print("FAIL: argmax agreement below 99%")
        return 1
    print("OK: native CRF matches pydensecrf at every call-site regime")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
