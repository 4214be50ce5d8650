"""Command-line entry points.

- ``python -m attwarp_tpu.cli.warp``             — single-image warp (C3 CLI)
- ``python -m attwarp_tpu.cli.process_dataset``  — dataset drivers (C12/C13)
- ``python -m attwarp_tpu.cli.train``            — MarginalNet training (C25)
- ``python -m attwarp_tpu.cli.evaluate``         — TextVQA accuracy (C15)
"""
