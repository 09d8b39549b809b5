from .bindings import (
    NativeRing,
    ScanPrefetcher,
    native_available,
    read_f32,
    read_pcd,
    write_pcd,
)
