from .lio_tracker import LioConfig, LioTracker
