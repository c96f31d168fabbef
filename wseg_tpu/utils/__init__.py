from wseg_tpu.utils.logging import Logger, AverageMeter, Timer, ScalarWriter
from wseg_tpu.utils.registry import Registry
