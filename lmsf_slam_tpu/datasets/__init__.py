from .synthetic import SyntheticWorld, make_world, make_trajectory, scan_at
from .simulator import SimWorld, make_sim_world, simulate_scan, simulate_scan_moving
