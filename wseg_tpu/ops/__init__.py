from wseg_tpu.ops.resize import resize_bilinear, avg_pool2d, resize_weights
from wseg_tpu.ops.cam import max_norm, max_onehot, cam_bg_complete, fuse_msf_cams
from wseg_tpu.ops.pcm import pcm
from wseg_tpu.ops.pairs import (
    radius_pair_indices,
    pairwise_affinity,
    dense_affinity_matrix,
)
from wseg_tpu.ops.random_walk import random_walk_refine
