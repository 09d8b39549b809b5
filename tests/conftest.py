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


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: runs on the real TPU chip (skipped when absent)"
    )
