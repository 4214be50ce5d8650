"""Command-line entry points.

- ``python -m attwarp_tpu.cli.warp``             — single-image warp (C3 CLI)
- ``python -m attwarp_tpu.cli.process_dataset``  — dataset drivers (C12/C13)
- ``python -m attwarp_tpu.cli.train``            — MarginalNet training (C25)
- ``python -m attwarp_tpu.cli.evaluate``         — TextVQA accuracy (C15)
"""

import os


def pin_platform() -> None:
    """Honor ``JAX_PLATFORMS`` even when the environment preloads jax.

    Some deployments preload jax from a sitecustomize that registers a TPU
    plugin BEFORE the CLI runs; by then the env var alone no longer selects
    the backend and ``JAX_PLATFORMS=cpu python -m attwarp_tpu.cli...``
    would silently run on the TPU (observed: a CPU-intended driver run
    contending with a TPU job). Every CLI main calls this first."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        jax.config.update("jax_platforms", want)
