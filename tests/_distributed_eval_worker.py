"""Worker for the 2-process distributed `evaluate --distributed` CLI test.

Launched by tests/test_distributed.py with JAX_PLATFORMS=cpu. Exercises the
REAL CLI entry (`cli.main`) with the --distributed flag; the model registry
and speech corpus are stubbed so the test needs no trained checkpoints or
datasets — what is under test is the partition/merge/barrier plumbing from
the CLI down through evaluate_grid_distributed.
"""

import os
import sys


def main():
    import numpy as np

    import sincformer_tpu.evaluation.grid as grid

    class _Identity:
        """Pass-through 'enhancer' — enough to drive the full grid."""

        def enhance_batch(self, noisy):
            return np.asarray(noisy, np.float32)

        def enhance_signal(self, noisy):
            return np.asarray(noisy, np.float32)

    grid.discover_pipelines = lambda *a, **k: {"identity": _Identity()}
    grid.find_speech_files = lambda *a, **k: []

    from sincformer_tpu import cli

    cli.main(["evaluate", "--distributed", "--max-eval", "2"])

    import jax

    assert jax.process_count() == int(os.environ["JAX_NUM_PROCESSES"])
    print(f"EVAL_WORKER_OK pid={jax.process_index()}")


if __name__ == "__main__":
    main()
