from .ml_system import (
    FeatureParams,
    FrameResult,
    KeyframeGate,
    MultiLidarSystem,
    SystemConfig,
)
