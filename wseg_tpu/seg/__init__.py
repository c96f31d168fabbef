from wseg_tpu.seg.config import SegConfig, EXPERIMENTS
from wseg_tpu.seg import deeplab, backbones, xception  # register nets/backbones
from wseg_tpu.seg import dataset, extra_datasets  # register datasets
