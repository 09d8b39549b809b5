from .localmap import LocalMapState, localmap_empty, localmap_add, localmap_flatten
from .tracker import TrackerConfig, TrackerState, tracker_init, tracker_step
