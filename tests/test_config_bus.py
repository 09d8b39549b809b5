"""YAML config factory + DataBus (DataManager equivalent)."""
import math

import numpy as np
import pytest

from lmsf_slam_tpu.common.databus import DataBus
from lmsf_slam_tpu.system.config import (
    system_config_from_dict,
    system_config_from_yaml,
)


def test_yaml_roundtrip_default_file():
    cfg = system_config_from_yaml("config/default.yaml")
    assert cfg.feature.rings == 16 and cfg.feature.width == 900
    assert cfg.registration.max_iters == 10
    assert abs(cfg.keyframe_rot - math.radians(30)) < 1e-9
    assert cfg.loop.min_frame_interval == 100
    assert cfg.lifelong.optimize_batch == 10
    # the production default: backend pipelined on a worker thread
    assert cfg.async_backend is True


def test_duplicate_key_fails_loudly(tmp_path):
    p = tmp_path / "dup.yaml"
    p.write_text("async_backend: true\nkeyframe_trans: 1.0\nasync_backend: false\n")
    with pytest.raises(KeyError, match="duplicate config key 'async_backend'"):
        system_config_from_yaml(str(p))


def test_unknown_key_fails_loudly():
    with pytest.raises(KeyError, match="keyfame_trans"):
        system_config_from_dict({"keyfame_trans": 2.0})
    with pytest.raises(KeyError, match="feature.ringz"):
        system_config_from_dict({"feature": {"ringz": 32}})


def test_type_coercion():
    cfg = system_config_from_dict(
        {"tracker_window": "8", "map_update_trans": 1,
         "feature": {"edges_per_sector": 2.0}}
    )
    assert cfg.tracker_window == 8 and isinstance(cfg.tracker_window, int)
    assert cfg.map_update_trans == 1.0
    assert cfg.feature.edges_per_sector == 2


def test_config_builds_system():
    from lmsf_slam_tpu.system import MultiLidarSystem

    cfg = system_config_from_dict(
        {"feature": {"rings": 8, "width": 120, "edges_per_sector": 2,
                     "surfs_per_sector": 4},
         "tracker_window": 2}
    )
    system = MultiLidarSystem(cfg)
    assert system.tracker_config.edge_capacity == 8 * 6 * 2


def test_databus_pubsub():
    bus = DataBus()
    bus.register("odom", dict, capacity=3)
    for i in range(5):
        bus.publish("odom", {"i": i})
    # capacity bound dropped the oldest two
    assert bus.size("odom") == 3
    assert bus.latest("odom")["i"] == 4
    got = bus.read_all("odom", consumer="viz")
    assert [g["i"] for g in got] == [2, 3, 4]
    assert bus.read("odom", consumer="viz") is None  # cursor caught up
    # a second consumer has its own cursor
    assert bus.read("odom", consumer="log")["i"] == 2
    with pytest.raises(TypeError):
        bus.publish("odom", [1, 2])
    with pytest.raises(ValueError):
        bus.register("odom", dict)
