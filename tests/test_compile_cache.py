"""Persistent-compile-cache plumbing (utils/compile_cache.py).

The CLIs enable JAX's persistent compilation cache so multi-process runs
(process_dataset -> evaluate -> serve) reuse the expensive 7B executables.
These tests cover the directory-resolution contract only; the actual
cache-hit behavior is JAX's and was verified on the relay (bench_utils).
"""
import os

import jax
import pytest

from attwarp_tpu.utils.compile_cache import enable_compile_cache


@pytest.fixture()
def _restore_cache_config():
    prev = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", prev)


def test_explicit_path_wins_and_is_created(tmp_path, monkeypatch,
                                           _restore_cache_config):
    monkeypatch.setenv("ATTWARP_COMPILE_CACHE_DIR", str(tmp_path / "ignored"))
    target = str(tmp_path / "explicit")
    assert enable_compile_cache(target) == target
    assert os.path.isdir(target)
    assert jax.config.jax_compilation_cache_dir == target


def test_env_var_disables(monkeypatch, _restore_cache_config):
    before = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("ATTWARP_COMPILE_CACHE_DIR", "")
    assert enable_compile_cache() is None
    assert jax.config.jax_compilation_cache_dir == before
    monkeypatch.setenv("ATTWARP_COMPILE_CACHE_DIR", "0")
    assert enable_compile_cache() is None


def test_env_var_selects_directory(tmp_path, monkeypatch,
                                   _restore_cache_config):
    target = str(tmp_path / "from_env")
    monkeypatch.setenv("ATTWARP_COMPILE_CACHE_DIR", target)
    assert enable_compile_cache() == target
    assert os.path.isdir(target)


def test_existing_config_respected(tmp_path, monkeypatch,
                                   _restore_cache_config):
    monkeypatch.delenv("ATTWARP_COMPILE_CACHE_DIR", raising=False)
    prior = str(tmp_path / "prior")
    jax.config.update("jax_compilation_cache_dir", prior)
    # No env, config already set -> leave it alone (don't mkdir a new one).
    assert enable_compile_cache() == prior
    assert jax.config.jax_compilation_cache_dir == prior
