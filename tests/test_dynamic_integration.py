"""Dynamic-object filtering + synchronized occupancy grid INSIDE the System
(reference README TODOs #3/#4: the grid and the mover filter are pipeline
features, not library functions): a moving pillar crosses the scene; with
carving enabled its trail is largely absent from the lifelong map and its
old positions read as free space in the live grid."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsf_slam_tpu.backend import LifelongConfig, LoopConfig
from lmsf_slam_tpu.datasets import make_sim_world, simulate_scan
from lmsf_slam_tpu.mapping.occupancy import OccupancyConfig, occupancy_probability
from lmsf_slam_tpu.ops.registration import RegistrationParams
from lmsf_slam_tpu.system import FeatureParams, MultiLidarSystem, SystemConfig

KEY = jax.random.PRNGKey(11)
N = 16
MOVER_R = 0.6
FIRST_XY = np.array([-8.0, 0.0])  # world→map frame offset (first sensor pose)


def _mover_pos(i):
    """Mover position in WORLD coordinates at frame i."""
    return np.array([2.5, 2.0 + 0.8 * i])


def _run(carve: bool, occupancy=None):
    base = make_sim_world(KEY, extent=25.0, n_boxes=8, n_cylinders=12)
    cfg = SystemConfig(
        feature=FeatureParams(rings=16, width=360),
        registration=RegistrationParams(max_iters=8, max_corr_dist=2.0),
        map_update_trans=0.2,
        keyframe_trans=0.4,  # every 1 m frame step becomes a keyframe
        loop=LoopConfig(min_frame_interval=10**9),
        lifelong=LifelongConfig(
            optimize_batch=10**9,
            dynamic_carve_knn=6 if carve else 0,
            occupancy=occupancy,
        ),
    )
    system = MultiLidarSystem(cfg)
    for i in range(N):
        # a 0.6 m pillar strolling +y while the robot drives +x past it
        mover = jnp.asarray(
            np.array([[*_mover_pos(i), MOVER_R, 3.0]], np.float32)
        )
        world = base._replace(
            cylinders=jnp.concatenate([base.cylinders, mover])
        )
        pose = jnp.asarray(
            np.array([1, 0, 0, 0, 1.0 * i - 8.0, 0.0, 1.4], np.float32)
        )
        scan = simulate_scan(world, pose, jax.random.fold_in(KEY, i),
                             rings=16, width=360, max_range=40.0, noise=0.01)
        system.process(scan, 0.1 * i)
    return system


def _trail_points(system, frames):
    """Elevated map points (map frame) near the mover's position at
    ``frames``. The map frame is anchored at the first SENSOR pose, so
    world→map subtracts FIRST_XY and ground sits at ≈ −sensor_height;
    near-ground points are excluded — carving deliberately never touches
    them (grazing rays make ground visibility tests unreliable)."""
    pts = system.global_map()
    ground = np.percentile(pts[:, 2], 2.0)
    pts = pts[pts[:, 2] > ground + 0.8]
    count = 0
    for i in frames:
        p = _mover_pos(i) - FIRST_XY
        d = np.linalg.norm(pts[:, :2] - p[None, :], axis=1)
        count += int((d < MOVER_R + 0.4).sum())
    return count


@pytest.mark.slow
def test_carve_removes_mover_trail_from_map_and_grid():
    early = range(0, 10)  # positions later scans can see through
    sys_off = _run(carve=False)
    n_off = _trail_points(sys_off, early)
    assert n_off > 25, f"mover never entered the uncarved map ({n_off})"

    occ = OccupancyConfig(size=256, resolution=0.25)
    sys_on = _run(carve=True, occupancy=occ)
    n_on = _trail_points(sys_on, early)
    assert n_on < 0.4 * n_off, (n_on, n_off)

    # live occupancy grid: the mover's early cells read free (the repeated
    # see-through free-space updates outvote the single hit)
    grid = sys_on.occupancy_grid()
    assert grid is not None
    prob = np.asarray(occupancy_probability(grid))
    hits = 0
    for i in early:
        c = np.floor(
            (_mover_pos(i) - FIRST_XY) / occ.resolution
        ).astype(int) + occ.size // 2
        if prob[c[0], c[1]] > 0.5:
            hits += 1
    assert hits <= 2, hits

    # static structure is intact: the carved map keeps the bulk of its points
    assert sys_on.global_map().shape[0] > 0.85 * sys_off.global_map().shape[0]


def test_occupancy_grid_marks_static_structure():
    occ = OccupancyConfig(size=256, resolution=0.25)
    sys_on = _run(carve=True, occupancy=occ)
    grid = sys_on.occupancy_grid()
    prob = np.asarray(occupancy_probability(grid))
    # some cells occupied (static pillars/boxes), plenty free along the path
    assert (prob > 0.8).sum() > 20
    assert (prob < 0.2).sum() > 200
