"""lmsf_slam_tpu — TPU-native lifelong multi-sensor LiDAR SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Robot-WH/LMSF-Slam (see SURVEY.md): LOAM feature frontend, scan-to-local-map
registration, multi-LiDAR online extrinsic calibration, scan-context loop
closure + relocalization, lifelong pose-graph backend with a
RELOCALIZATION/LOCALIZATION/MAPPING mode FSM, persistent keyframe database,
and ESKF IMU/GNSS fusion — all with static shapes, batched MXU-friendly
kernels, and pjit/shard_map scale-out.
"""

__version__ = "0.1.0"

import jax as _jax

# SLAM is geometry: small-matrix products (SE(3) ops, 3×3 covariance algebra,
# 6×6 normal equations) must be true float32 — the platform default truncates
# matmul inputs to bfloat16-class precision, which corrupts V-matrix products
# by ~1e-2 and GN steps measurably. Hot large matmuls that tolerate reduced
# precision (e.g. k-NN candidate selection, descriptor search) opt in
# explicitly via `precision=` at the call site.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: registrations/solvers are recompiled per
# static shape, and on-chip compiles over the remote-TPU tunnel run minutes;
# caching them on disk amortizes the cost across processes (evaluate.py,
# bench.py, services). Opt out with LMSF_NO_COMPILE_CACHE=1; override the
# location with JAX_COMPILATION_CACHE_DIR.
import os as _os

if not _os.environ.get("LMSF_NO_COMPILE_CACHE"):
    _cache = _os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not _cache:
        # source checkout: cache beside the repo (shared by evaluate/bench/
        # tests). Installed package (site-packages — a directory the process
        # may not own): fall back to a per-user cache dir.
        _pkg_parent = _os.path.dirname(
            _os.path.dirname(_os.path.abspath(__file__))
        )
        if _os.path.isdir(_os.path.join(_pkg_parent, ".git")):
            _cache = _os.path.join(_pkg_parent, ".jax_cache")
        else:
            _cache = _os.path.join(
                _os.environ.get(
                    "XDG_CACHE_HOME",
                    _os.path.join(_os.path.expanduser("~"), ".cache"),
                ),
                "lmsf_slam_tpu", "jax_cache",
            )
    _jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
