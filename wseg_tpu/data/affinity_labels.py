"""Affinity target extraction over radius-neighborhood pairs (host-side).

Rebuild of `voc12/data.py:149-199` (`ExtractAffinityLabelInRadius`): from a
(h, w) pseudo-label map (255 = ignore), produce (bg_pos, fg_pos, neg) float
masks over the same half-disc displacement pair set the model's affinity head
uses, so targets and predictions align elementwise.
"""

from __future__ import annotations

import numpy as np

from wseg_tpu.ops.pairs import search_offsets


class ExtractAffinityLabelInRadius:
    def __init__(self, cropsize: int, radius: int = 5):
        # same small-grid clamp as the affinity head (models/affinity.py):
        # targets and predictions must use the identical pair set
        if cropsize < radius * 2 + 1:
            radius = (cropsize - 1) // 2
        self.radius = radius
        self.search_dist = search_offsets(radius)
        self.radius_floor = radius - 1
        self.crop_height = cropsize - self.radius_floor
        self.crop_width = cropsize - 2 * self.radius_floor

    def __call__(self, label: np.ndarray):
        rf = self.radius_floor
        labels_from = label[:-rf, rf:-rf].reshape(-1)

        labels_to_list, valid_list = [], []
        for dy, dx in self.search_dist:
            lt = label[dy : dy + self.crop_height, rf + dx : rf + dx + self.crop_width]
            lt = lt.reshape(-1)
            labels_to_list.append(lt)
            valid_list.append(np.logical_and(lt < 255, labels_from < 255))

        labels_from_b = labels_from[None]
        labels_to = np.stack(labels_to_list)
        valid = np.stack(valid_list)

        pos = np.equal(labels_from_b, labels_to)
        bg_pos = np.logical_and(pos, labels_from_b == 0).astype(np.float32)
        fg_pos = np.logical_and(
            np.logical_and(pos, labels_from_b != 0), valid
        ).astype(np.float32)
        neg = np.logical_and(np.logical_not(pos), valid).astype(np.float32)
        return bg_pos, fg_pos, neg
