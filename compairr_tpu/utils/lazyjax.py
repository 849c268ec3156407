"""Deferred JAX loading for host-only routes.

Importing jax costs ~2 s wall in accelerator environments whose
platform plugin bootstraps at interpreter start (a sitecustomize that
registers a PJRT plugin imports jax transitively). CompAIRR's most
common runs — exact joins, dedup, substitution-distance pigeonhole,
existence variant joins — never touch a device, so the CLI launcher
(bin/compairr) moves the plugin's trigger env aside
(COMPAIRR_DEFERRED_AXON_IPS) and the engine imports jax through the
lazy proxies below: the first real device route restores the env,
re-runs sitecustomize (re-registering the plugin), and imports jax —
paying the cost only when a device is actually used.

Under a plain `python -m compairr_tpu` (no launcher) everything here
is a transparent pass-through.
"""

from __future__ import annotations

import importlib
import os

_loaded: dict = {}
_bootstrapped = False


def _bootstrap() -> None:
    """Restore a deferred accelerator-plugin env and re-run
    sitecustomize so the plugin registers before jax binds backends."""
    global _bootstrapped
    if _bootstrapped:
        return
    _bootstrapped = True
    saved = os.environ.pop("COMPAIRR_DEFERRED_AXON_IPS", None)
    if saved:
        os.environ["PALLAS_AXON_POOL_IPS"] = saved
        try:
            import sitecustomize

            importlib.reload(sitecustomize)
        except Exception:
            pass


def ensure_jax():
    """Bootstrap (if deferred) and return the real jax module — for
    modules that bind jax names directly (device-only code)."""
    _bootstrap()
    mod = _loaded.get("jax")
    if mod is None:
        mod = importlib.import_module("jax")
        _loaded["jax"] = mod
    return mod


class _Lazy:
    """Module proxy resolving on first attribute access."""

    def __init__(self, name: str):
        self._name = name

    def __getattr__(self, attr):
        mod = _loaded.get(self._name)
        if mod is None:
            _bootstrap()
            mod = importlib.import_module(self._name)
            _loaded[self._name] = mod
        return getattr(mod, attr)


jax = _Lazy("jax")
jnp = _Lazy("jax.numpy")
lax = _Lazy("jax.lax")
