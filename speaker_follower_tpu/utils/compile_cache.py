"""Persistent XLA compilation cache.

The fused state-factored search program costs minutes of XLA compile
time per fresh process on the TPU backend (runs/sf_beam40_r5.log
documents a 537 s compile before the first dispatch), and the trainer /
bench programs add tens of seconds each.  None of that work changes
between runs: the reference pays nothing comparable because torch 0.3
has no compile step, so amortizing ours across processes is what makes
the CLI wall-clocks honest production numbers rather than
compile-dominated ones.

JAX ships a content-addressed persistent cache (keyed on optimized HLO
+ compile options + backend); enabling it is one config call, and it
works through the tunneled axon backend.  Measured cold/warm in fresh
processes (runs/compile_cache_r5.log, scripts/probe_compile_cache.py):
the production beam-40 fused-search program compiles in 23.6 s cold vs
1.6 s warm, the bench inference rollout 2.08 s vs 0.22 s, and warm
processes write zero new cache entries (pure hits).

Env knobs:
  SFNAV_XLA_CACHE=0        disable entirely
  SFNAV_XLA_CACHE=1        force on, INCLUDING the CPU backend (default
                           is TPU/accelerator only: XLA:CPU AOT entries
                           embed host machine-feature sets, and loading
                           one recorded under a different feature
                           detection warns of possible SIGILL — observed
                           between same-host processes here; CPU
                           compiles are seconds, so caching them buys
                           little and risks that)
  SFNAV_XLA_CACHE_DIR=...  cache directory
                           (default ~/.cache/speaker_follower_tpu/xla)
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "speaker_follower_tpu", "xla"
)

_enabled_dir: str | None = None


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 1.0) -> str | None:
    """Point JAX's persistent compilation cache at a writable directory.

    Safe to call multiple times (idempotent) and at any point before the
    first compilation of interest — already-compiled executables in this
    process are unaffected.  Returns the cache dir, or None if disabled
    via SFNAV_XLA_CACHE=0 or setup failure (never raises: a missing
    cache must not take down a training run).
    """
    global _enabled_dir
    knob = os.environ.get("SFNAV_XLA_CACHE", "")
    if knob == "0":
        return None
    if _enabled_dir is not None:
        return _enabled_dir
    path = cache_dir or os.environ.get("SFNAV_XLA_CACHE_DIR", _DEFAULT_DIR)
    try:
        import jax

        if jax.default_backend() == "cpu" and knob != "1":
            # CPU AOT cache entries embed machine-feature sets; loading
            # one recorded under a different feature detection warns of
            # possible SIGILL (observed same-host).  Opt in explicitly.
            return None
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - defensive
        import sys

        print(f"[compile-cache] disabled ({type(e).__name__}: {e})",
              file=sys.stderr)
        return None
    _enabled_dir = path
    return path
