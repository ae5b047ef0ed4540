"""Persistent XLA compilation cache wiring (utils/compile_cache.py).

The behavioral claim (a fresh process loads a prior process's compiled
executable) is measured on-chip in runs/compile_cache_r5.log; here we
pin the config plumbing: enable points JAX at the requested directory,
is idempotent, honors the kill switch, and actually produces cache
entries for a compile above the threshold.
"""

import importlib
import os

import jax
import pytest

from speaker_follower_tpu.utils import compile_cache


@pytest.fixture(autouse=True)
def _restore_jax_cache_config():
    """Undo the global jax.config mutations these tests make.

    enable_persistent_cache() flips process-global config; leaving the
    CPU AOT cache live for the rest of the suite reproduces the exact
    SIGILL/SIGSEGV hazard the module docstring documents (observed as a
    segfault in the cache-read path under a later, unrelated test).
    """
    keys = (
        "jax_compilation_cache_dir",
        "jax_persistent_cache_min_compile_time_secs",
        "jax_persistent_cache_min_entry_size_bytes",
    )
    saved = {k: getattr(jax.config, k) for k in keys}
    yield
    for k, v in saved.items():
        jax.config.update(k, v)
    compile_cache._enabled_dir = None


def _fresh(monkeypatch, **env):
    for k in ("SFNAV_XLA_CACHE", "SFNAV_XLA_CACHE_DIR"):
        monkeypatch.delenv(k, raising=False)
    # tests run on the CPU backend, where caching is opt-in (CPU AOT
    # entries embed machine-feature sets; see compile_cache docstring)
    monkeypatch.setenv("SFNAV_XLA_CACHE", env.pop("SFNAV_XLA_CACHE", "1"))
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    return importlib.reload(compile_cache)


def test_enable_sets_config_and_is_idempotent(monkeypatch, tmp_path):
    mod = _fresh(monkeypatch)
    d = str(tmp_path / "xla")
    assert mod.enable_persistent_cache(d) == d
    assert jax.config.jax_compilation_cache_dir == d
    # second call (different arg) is a no-op returning the live dir
    assert mod.enable_persistent_cache(str(tmp_path / "other")) == d
    assert os.path.isdir(d)


def test_kill_switch(monkeypatch, tmp_path):
    mod = _fresh(monkeypatch, SFNAV_XLA_CACHE="0")
    assert mod.enable_persistent_cache(str(tmp_path / "x")) is None


def test_env_dir_override(monkeypatch, tmp_path):
    d = str(tmp_path / "from_env")
    mod = _fresh(monkeypatch, SFNAV_XLA_CACHE_DIR=d)
    assert mod.enable_persistent_cache() == d


def test_cache_entry_written(monkeypatch, tmp_path):
    mod = _fresh(monkeypatch)
    d = str(tmp_path / "entries")
    mod.enable_persistent_cache(d, min_compile_secs=0.0)

    @jax.jit
    def f(x):
        return (x * 2.0 + 1.0).sum()

    import numpy as np

    f(np.ones((8, 8), np.float32)).block_until_ready()
    assert os.listdir(d), "no cache entry written"


def test_cpu_backend_is_optin(monkeypatch, tmp_path):
    # default (no SFNAV_XLA_CACHE): disabled on the CPU backend
    mod = _fresh(monkeypatch)
    monkeypatch.delenv("SFNAV_XLA_CACHE", raising=False)
    mod = importlib.reload(compile_cache)
    assert jax.default_backend() == "cpu"
    assert mod.enable_persistent_cache(str(tmp_path / "x")) is None
