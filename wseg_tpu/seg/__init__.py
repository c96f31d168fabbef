from wseg_tpu.seg.config import SegConfig, EXPERIMENTS
from wseg_tpu.seg import deeplab, backbones, xception  # register nets/backbones
