"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors the multi-host test strategy recommended in SURVEY.md §4 — the
reference has no automated tests at all; we test every kernel against closed
forms and the sharded paths against single-device results.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")
