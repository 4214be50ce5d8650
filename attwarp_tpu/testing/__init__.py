"""Test support: NumPy golden oracle and a fake MLLM backend."""
