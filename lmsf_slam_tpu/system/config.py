"""YAML config factory: assemble a SystemConfig from a file.

Capability parity with the reference's two-tier config system — algorithm
YAML read through cv::FileStorage (`inc/Common/read_param.hpp:37-48`) and
factory classes that assemble the pipeline from config strings
(`inc/factory/System/ML_SystemFactory.hpp:54-205`: working mode,
registration method, NDT/preprocess parameters). Here the factory maps a
nested YAML document onto the typed NamedTuple config tree: every key must
name a real field (typos fail loudly instead of silently using defaults),
and values are coerced to the field's default type.
"""
from __future__ import annotations

import math
from typing import Any

import yaml

from .ml_system import FeatureParams, SystemConfig


def _merge(default: Any, override: dict, path: str = ""):
    """Recursively overlay a dict onto a NamedTuple, type-coercing leaves."""
    if not isinstance(override, dict):
        raise TypeError(f"{path or 'config'}: expected a mapping")
    fields = default._fields
    updates = {}
    for key, val in override.items():
        if key not in fields:
            raise KeyError(
                f"unknown config key {path + key!r}; valid: {sorted(fields)}"
            )
        cur = getattr(default, key)
        if hasattr(cur, "_fields") and isinstance(val, dict):
            updates[key] = _merge(cur, val, path + key + ".")
        elif isinstance(cur, bool):
            updates[key] = bool(val)
        elif isinstance(cur, int) and not isinstance(val, bool):
            updates[key] = int(val)
        elif isinstance(cur, float):
            # degrees convenience: "<field>_deg" handled by callers; here
            # plain float coercion
            updates[key] = float(val)
        else:
            updates[key] = val
    return default._replace(**updates)


def system_config_from_dict(doc: dict) -> SystemConfig:
    doc = dict(doc or {})
    # convenience: rotation thresholds may be given in degrees
    for deg_key, rad_key in (
        ("keyframe_rot_deg", "keyframe_rot"),
        ("map_update_rot_deg", "map_update_rot"),
    ):
        if deg_key in doc:
            doc[rad_key] = math.radians(float(doc.pop(deg_key)))
    # optional nested blocks whose default is None (can't be introspected)
    lifelong = doc.get("lifelong")
    if isinstance(lifelong, dict) and isinstance(lifelong.get("occupancy"), dict):
        from ..mapping.occupancy import OccupancyConfig

        lifelong = dict(lifelong)
        lifelong["occupancy"] = _merge(
            OccupancyConfig(), lifelong["occupancy"], "lifelong.occupancy."
        )
        doc["lifelong"] = lifelong
    return _merge(SystemConfig(), doc)


class _StrictLoader(yaml.SafeLoader):
    """SafeLoader that rejects duplicate mapping keys.

    PyYAML silently keeps the LAST occurrence, so a stray re-declaration at
    the bottom of a config file would override the documented value without
    any diagnostic — the same fail-loudly policy as unknown keys."""


def _strict_mapping(loader, node, deep=False):
    seen = set()
    for key_node, _ in node.value:
        key = loader.construct_object(key_node, deep=deep)
        if key == "<<":
            # YAML merge keys are flattened by construct_mapping below;
            # multiple '<<' entries and explicit-key-overrides-merge are
            # legitimate, so the duplicate check covers explicit keys only
            continue
        if key in seen:
            raise KeyError(
                f"duplicate config key {key!r} (line {key_node.start_mark.line + 1})"
            )
        seen.add(key)
    return yaml.SafeLoader.construct_mapping(loader, node, deep)


_StrictLoader.add_constructor(
    yaml.resolver.BaseResolver.DEFAULT_MAPPING_TAG, _strict_mapping
)


def system_config_from_yaml(path: str) -> SystemConfig:
    """Load a SystemConfig from a YAML file (reference factory entry:
    `ML_SystemFactory` built from a YAML path, `MultiLidarSLAM_node.cpp:71`).
    Unknown AND duplicate keys fail loudly."""
    with open(path) as f:
        doc = yaml.load(f, Loader=_StrictLoader)
    return system_config_from_dict(doc)


__all__ = ["system_config_from_dict", "system_config_from_yaml",
           "FeatureParams", "SystemConfig"]
