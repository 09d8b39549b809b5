from .synthetic import SyntheticWorld, make_world, make_trajectory, scan_at
