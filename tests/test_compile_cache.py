"""Persistent XLA compilation cache wiring (runtime/compile_cache.py)."""

import jax
import pytest

from ics_tpu.runtime import compile_cache


@pytest.fixture(autouse=True)
def restore_cache_state():
    """These tests mutate global jax config + module state; restore both so
    the rest of the suite doesn't compile into a pytest tmp dir."""
    before_dir = jax.config.jax_compilation_cache_dir
    before_enabled = compile_cache._enabled_dir
    yield
    jax.config.update("jax_compilation_cache_dir", before_dir)
    compile_cache._enabled_dir = before_enabled


def test_enable_points_jax_at_dir(tmp_path):
    target = str(tmp_path / "xla_cache")
    assert compile_cache.enable_persistent_cache(target) is True
    assert jax.config.jax_compilation_cache_dir == target
    # the directory is created eagerly so the first compile can write
    assert (tmp_path / "xla_cache").is_dir()
    # idempotent re-enable
    assert compile_cache.enable_persistent_cache(target) is True


def test_empty_dir_disables(tmp_path):
    before = jax.config.jax_compilation_cache_dir
    assert compile_cache.enable_persistent_cache("") is False
    assert jax.config.jax_compilation_cache_dir == before


def test_defaults_from_settings(tmp_path, monkeypatch):
    from ics_tpu.core import config

    monkeypatch.setattr(
        config.settings, "TPU_COMPILATION_CACHE_DIR",
        str(tmp_path / "from_settings"),
    )
    compile_cache._enabled_dir = None
    assert compile_cache.enable_persistent_cache() is True
    assert jax.config.jax_compilation_cache_dir == str(
        tmp_path / "from_settings"
    )
