"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors the multi-host test strategy recommended in SURVEY.md §4 — the
reference has no automated tests at all; we test every kernel against closed
forms and the sharded paths against single-device results.

This environment force-registers the `axon` TPU platform ahead of
``JAX_PLATFORMS``, so setting the env var alone does NOT move tests off the
chip — we additionally pin ``jax_default_device`` to CPU so unit tests are
fast, deterministic, and leave the real chip free for `bench.py`/verify runs.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])

# persistent compilation cache: the 2-vCPU host makes XLA:CPU compilation the
# dominant suite cost; caching compiled executables across runs cuts repeat
# suite time several-fold (cache dir is gitignored)
_cache = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_addoption(parser):
    parser.addoption(
        "--slow",
        action="store_true",
        default=False,
        help="also run tests marked slow (golden-path / scale tests)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: runs on the real TPU chip (skipped when absent)"
    )
    config.addinivalue_line(
        "markers",
        "slow: golden-path / scale test, skipped by default "
        "(run with --slow or RUN_SLOW=1) so the default suite stays under "
        "the driver's budget on this 2-vCPU host",
    )


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    run_slow = (
        config.getoption("--slow")
        or os.environ.get("RUN_SLOW", "") == "1"
        # explicit selection (`-m slow`) also runs them
        or "slow" in (config.getoption("-m") or "")
    )
    if run_slow:
        return
    skip = _pytest.mark.skip(reason="slow test: pass --slow or RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
