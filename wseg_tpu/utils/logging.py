"""Logging / metering utilities.

Mirrors the observable surface of the reference's `tool/pyutils.py`
(`Logger` stdout tee at tool/pyutils.py:6-17, `AverageMeter` :20-45,
`Timer` with ETA :48-71) plus a TensorBoard-compatible scalar writer that
replaces tensorboardX (`contrast_train.py:62,424-434`) without the torch
dependency: scalars land in a JSONL event file that is trivially plottable
and, when `tensorboardX` happens to be installed, are mirrored to real TB
event files.
"""

from __future__ import annotations

import json
import os
import sys
import time


class Logger:
    """Tee stdout to a logfile (created along with parent dirs)."""

    def __init__(self, outfile: str):
        os.makedirs(os.path.dirname(outfile) or ".", exist_ok=True)
        self.terminal = sys.stdout
        self.log = open(outfile, "w")
        sys.stdout = self

    def write(self, message: str):
        self.terminal.write(message)
        self.log.write(message)

    def flush(self):
        self.terminal.flush()
        self.log.flush()


class AverageMeter:
    """Running means keyed by metric name."""

    def __init__(self, *keys: str):
        self._data = {k: [0.0, 0] for k in keys}

    def add(self, values: dict):
        for k, v in values.items():
            if k not in self._data:
                self._data[k] = [0.0, 0]
            self._data[k][0] += float(v)
            self._data[k][1] += 1

    def get(self, *keys: str):
        vals = tuple(self._data[k][0] / max(self._data[k][1], 1) for k in keys)
        return vals[0] if len(vals) == 1 else vals

    def pop(self, key: str | None = None):
        if key is None:
            for k in self._data:
                self._data[k] = [0.0, 0]
            return None
        v = self.get(key)
        self._data[key] = [0.0, 0]
        return v


class Timer:
    """Wall-clock timer with progress-based ETA."""

    def __init__(self, starting_msg: str | None = None):
        self.start = time.time()
        self.stage_start = self.start
        self.est_finish = self.start
        if starting_msg is not None:
            print(starting_msg, time.ctime(time.time()))

    def update_progress(self, progress: float):
        self.elapsed = time.time() - self.start
        self.est_total = self.elapsed / max(progress, 1e-12)
        self.est_remaining = self.est_total - self.elapsed
        self.est_finish = int(self.start + self.est_total)

    def str_est_finish(self) -> str:
        return str(time.ctime(self.est_finish))

    def get_stage_elapsed(self) -> float:
        return time.time() - self.stage_start

    def reset_stage(self):
        self.stage_start = time.time()


class ScalarWriter:
    """Scalar/metric event writer.

    Writes one JSON line per event to `<logdir>/events.jsonl`. If
    tensorboardX is importable, mirrors scalars there too, so the reference's
    `tblogger.add_scalars(...)` workflow keeps working.
    """

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._logdir = logdir
        self._f = open(os.path.join(logdir, "events.jsonl"), "a")
        self._tb = None
        try:  # optional
            from tensorboardX import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(logdir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value, step: int):
        self._f.write(
            json.dumps({"t": time.time(), "step": int(step), tag: float(value)}) + "\n"
        )
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def add_scalars(self, main_tag: str, values: dict, step: int):
        rec = {"t": time.time(), "step": int(step)}
        rec.update({f"{main_tag}/{k}": float(v) for k, v in values.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalars(main_tag, {k: float(v) for k, v in values.items()}, step)

    def add_image(self, tag: str, img, step: int, dataformats: str = "HWC"):
        """Log an image (reference seg trainer logs input/label/pred colormaps
        every 100 iters, segmentation/.../train.py:107-120). `img` is a uint8
        or [0,1]-float array, HWC or CHW per `dataformats`. Images land as
        PNGs under `<logdir>/images/` and are mirrored to TB when available."""
        import numpy as np
        import PIL.Image

        arr = np.asarray(img)
        if dataformats == "CHW":
            arr = arr.transpose(1, 2, 0)
        if arr.ndim == 3 and arr.shape[-1] == 1:
            arr = arr[..., 0]
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        safe = tag.replace("/", "_").replace(" ", "_")
        img_dir = os.path.join(self._logdir, "images")
        os.makedirs(img_dir, exist_ok=True)
        path = os.path.join(img_dir, f"{safe}_{int(step):08d}.png")
        PIL.Image.fromarray(arr).save(path)
        self._f.write(
            json.dumps(
                {"t": time.time(), "step": int(step), f"image/{tag}": path}
            )
            + "\n"
        )
        self._f.flush()
        if self._tb is not None:
            chw = arr[None] if arr.ndim == 2 else arr.transpose(2, 0, 1)
            self._tb.add_image(tag, chw, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def writedict(f, dictionary: dict):
    """One-line `key:value` dump, matching the reference eval log format
    (`eval.py:89-95`)."""
    s = "".join("%s:%s  " % (k, v) for k, v in dictionary.items())
    f.write(s + "\n")


def writelog(filepath: str, metric: dict, comment: str):
    """Append a timestamped metric block (`eval.py:98-106`)."""
    os.makedirs(os.path.dirname(filepath) or ".", exist_ok=True)
    with open(filepath, "a") as logfile:
        logfile.write(time.strftime("%Y-%m-%d %H:%M:%S", time.localtime()))
        logfile.write("\t%s\n" % comment)
        writedict(logfile, metric)
        logfile.write("=====================================\n")
