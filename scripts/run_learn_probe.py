"""Run the e2e learning test body directly (live output, no pytest capture)
on the CPU platform — for tuning the test's lr/epochs/thresholds.

Usage: python scripts/run_learn_probe.py
"""

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_debug_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from tests import test_e2e_learning as t


def main():
    tmp = Path(tempfile.mkdtemp(prefix="learn_probe_"))
    t.test_contrast_train_learns_planted_correlation(tmp)


if __name__ == "__main__":
    main()
