from .profiling import StageTimer, device_trace
