"""Persistent keyframe / pose-graph database.

TPU-native re-design of the reference's lifelong map store
(`inc/BackEnd/pose_graph_database.hpp`): vertices + between-edges
(`inc/BackEnd/graph.hpp:20-81`), per-keyframe feature clouds
(`pose_graph_database.hpp:307-315` — one PCD per feature per keyframe),
a position cloud for geometric search (`:484-491`), and scan-context
descriptors (`SceneRecognitionScanContext.hpp:139-227`). The reference
keeps clouds on disk and text vertices/edges; here the store is
array-of-structs numpy on the host (single `.npz` checkpoint = the lifelong
database) with device-resident mirrors of everything searchable (positions,
descriptors, ring keys), so loop/relocalization candidate search is one
batched device program instead of kdtree walks.

Keyframe clouds are stored in the **sensor frame** with their odometry and
optimized (map-frame) poses; local maps are assembled with the *current*
optimized poses, so graph corrections automatically propagate to every later
localization query (the reference re-reads PCDs and transforms the same way,
`pose_graph_database.hpp:381-413`).
"""
from __future__ import annotations

import os
import shutil
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import se3
from ..common.pointcloud import PointBatch
from ..ops import scancontext


class GraphArrays(NamedTuple):
    """Padded device views of the graph for the batch GN solver."""

    poses: jax.Array  # (V, 7)
    vmask: jax.Array  # (V,)
    edges_ij: jax.Array  # (E, 2)
    edges_z: jax.Array  # (E, 7)
    edges_sqrtw: jax.Array  # (E, 6)
    emask: jax.Array  # (E,)
    erobust: jax.Array  # (E,) — robust kernel applies (loop edges)


def _grow(arr: np.ndarray, new_cap: int) -> np.ndarray:
    out = np.zeros((new_cap,) + arr.shape[1:], arr.dtype)
    out[: arr.shape[0]] = arr
    return out


from functools import partial  # noqa: E402


@partial(jax.jit, static_argnames=("rings", "sectors", "ecap", "scap"))
def _sc_ringkey(exyz, emask, sxyz, smask, rings: int, sectors: int,
                ecap: int, scap: int):
    """Scan-context + ring key of a keyframe's feature clouds in ONE fused
    device program (the split path costs two dispatches + two transfers per
    insert — RPC-bound on remote TPUs). Clouds are clipped to the database's
    storage capacities FIRST so the descriptor describes exactly the points
    the DB keeps (a descriptor of discarded overflow points would diverge
    from the verification clouds on capacity overflow)."""
    both = PointBatch(
        jnp.concatenate([exyz[:ecap], sxyz[:scap]]),
        jnp.concatenate([emask[:ecap], smask[:scap]]),
    )
    sc = scancontext.make_scan_context(both, rings=rings, sectors=sectors)
    return sc, scancontext.ring_key(sc)


@jax.jit
def _mirror_append_row(sc, rk, poses, pos, exyz, emk, sxyz, smk,
                       nsc, nrk, npose, nexyz, nemk, nsxyz, nsmk, lo):
    """Append ONE keyframe's rows to every mirror array in a single fused
    device program. The naive path (one dynamic_update_slice dispatch per
    array) costs 8 RPC round-trips per keyframe on a remote-TPU tunnel —
    measured as the dominant share of the 380-500 ms/call backend search
    stages in the round-4 profile."""
    return (
        jax.lax.dynamic_update_slice(sc, nsc[None], (lo, 0, 0)),
        jax.lax.dynamic_update_slice(rk, nrk[None], (lo, 0)),
        jax.lax.dynamic_update_slice(poses, npose[None], (lo, 0)),
        jax.lax.dynamic_update_slice(pos, npose[None, 4:], (lo, 0)),
        jax.lax.dynamic_update_slice(exyz, nexyz[None], (lo, 0, 0)),
        jax.lax.dynamic_update_slice(emk, nemk[None], (lo, 0)),
        jax.lax.dynamic_update_slice(sxyz, nsxyz[None], (lo, 0, 0)),
        jax.lax.dynamic_update_slice(smk, nsmk[None], (lo, 0)),
    )


@jax.jit
def _mirror_refresh_poses(poses_new):
    """One-dispatch pose refresh after an optimize: returns (poses, pos)."""
    return poses_new, poses_new[:, 4:]


@jax.jit
def _mirror_update_masks(emk, smk, nemk, nsmk, row):
    return (
        jax.lax.dynamic_update_slice(emk, nemk[None], (row, 0)),
        jax.lax.dynamic_update_slice(smk, nsmk[None], (row, 0)),
    )


@jax.jit
def _gather_local_map(exyz, emask, sxyz, smask, poses, ids, idmask):
    """Fixed-K padded local-map assembly, entirely device-resident.

    Gathers K keyframes' clouds from the resident mirror, transforms them
    with their CURRENT optimized poses and flattens — one kernel with fully
    static shapes. Replaces the per-call host→device cloud upload of
    ``local_map_ids`` (variable K → fresh XLA compile + ~0.5 MB H2D per
    localization/loop query; the reference's equivalent is a per-query disk
    read + transform, `pose_graph_database.hpp:381-413`)."""
    p = poses[ids]  # (K, 7)
    ew = se3.pose_apply(p, exyz[ids])  # (K, E, 3)
    sw = se3.pose_apply(p, sxyz[ids])
    em = emask[ids] & idmask[:, None]
    sm = smask[ids] & idmask[:, None]
    return (
        ew.reshape(-1, 3), em.reshape(-1),
        sw.reshape(-1, 3), sm.reshape(-1),
    )


@partial(jax.jit, static_argnames=("k",))
def _knn_gather_local_map(
    exyz, emk, sxyz, smk, poses, pos, valid, query, max_id, k: int
):
    """kNN over the position mirror + fixed-K local-map gather, fused into
    ONE device program — the localization local map costs a single dispatch
    with no ids round-trip (ids never leave the device)."""
    d2 = jnp.sum((pos - query[None, :]) ** 2, axis=-1)
    ok = valid & (jnp.arange(pos.shape[0]) < max_id)
    d2 = jnp.where(ok, d2, jnp.inf)
    neg, ids = jax.lax.top_k(-d2, k)
    idmask = jnp.isfinite(neg)
    ids = jnp.where(idmask, ids, 0)
    return _gather_local_map(exyz, emk, sxyz, smk, poses, ids, idmask)


@partial(jax.jit, static_argnames=("k",))
def _mirror_knn(pos, valid, query, max_id, k: int):
    """Masked k-NN over the device position mirror: one top-k, no kdtree."""
    d2 = jnp.sum((pos - query[None, :]) ** 2, axis=-1)
    ok = valid & (jnp.arange(pos.shape[0]) < max_id)
    d2 = jnp.where(ok, d2, jnp.inf)
    neg, ids = jax.lax.top_k(-d2, k)
    return ids, jnp.sqrt(jnp.maximum(-neg, 0.0))


# bulky per-keyframe payloads live on disk when a storage_dir is given —
# the reference keeps keyframe clouds out of RAM the same way (one PCD per
# keyframe per feature, `pose_graph_database.hpp:307-315`); poses/edges/
# ring-keys stay in RAM as the searchable mirrors.
_DISK_FIELDS = ("edge_xyz", "edge_mask", "surf_xyz", "surf_mask", "sc")


class KeyframeDatabase:
    """Append-only keyframe + pose-graph store with save/load.

    Capacities grow by doubling (amortized O(1), at most log2 retraces of
    any device program keyed on capacity).
    """

    def __init__(
        self,
        edge_capacity: int = 1024,
        surf_capacity: int = 4096,
        initial_keyframes: int = 256,
        sc_rings: int = scancontext.RINGS,
        sc_sectors: int = scancontext.SECTORS,
        storage_dir: str | None = None,
        mirror_min_cap: int = 512,
    ):
        """``storage_dir``: if given, bulky per-keyframe payloads (feature
        clouds, descriptors) are disk-backed memmaps under this directory —
        RAM stays bounded for lifelong sessions and checkpointing is
        incremental (memmap flush + a small npz of the graph)."""
        self.edge_capacity = edge_capacity
        self.surf_capacity = surf_capacity
        self.sc_shape = (sc_rings, sc_sectors)
        self.storage_dir = storage_dir
        # device-mirror capacity floor: pow2 growth from 1 would recompile
        # every searchable kernel (descriptor search, kNN, local-map gather)
        # at each doubling — minutes each over a remote-TPU tunnel. Starting
        # at ``mirror_min_cap`` rows (~65 KB/row of HBM) means ZERO
        # shape-driven recompiles until the database truly outgrows it.
        self.mirror_min_cap = mirror_min_cap
        if storage_dir is not None:
            os.makedirs(storage_dir, exist_ok=True)
        n = initial_keyframes
        self.n_keyframes = 0
        self.stamps = np.zeros(n, np.float64)
        self.odom_poses = np.zeros((n, 7), np.float32)
        self.map_poses = np.zeros((n, 7), np.float32)
        self.edge_xyz = self._alloc("edge_xyz", (n, edge_capacity, 3), np.float32)
        self.edge_mask = self._alloc("edge_mask", (n, edge_capacity), bool)
        self.surf_xyz = self._alloc("surf_xyz", (n, surf_capacity, 3), np.float32)
        self.surf_mask = self._alloc("surf_mask", (n, surf_capacity), bool)
        self.sc = self._alloc("sc", (n,) + self.sc_shape, np.float32)
        self.ring_keys = np.zeros((n, sc_rings), np.float32)
        # optional per-keyframe GNSS observation (map/ENU frame), the
        # reference KeyFrame's optional GNSS slot (`keyframe.hpp:25-101`)
        self.gnss_pos = np.zeros((n, 3), np.float32)
        self.gnss_valid = np.zeros(n, bool)
        # graph edges
        self.n_edges = 0
        self.eij = np.zeros((n, 2), np.int32)
        self.ez = np.zeros((n, 7), np.float32)
        self.esqrtw = np.zeros((n, 6), np.float32)
        # edge kind: False = odometry/sequential, True = loop closure —
        # drives the per-edge robust-kernel policy (the reference's
        # SetEdgeRobustKernel selectivity, `graph_optimization.hpp:19-47`)
        self.eloop = np.zeros(n, bool)
        # device-resident search mirror (descriptors, ring keys, positions):
        # appended incrementally, so loop/reloc candidate search never
        # re-uploads O(N) host state per query (the reference's incremental
        # kdtree-rebuild policy, `SceneRecognitionScanContext.hpp:30-33,74-92`)
        self._mirror: dict | None = None
        self._pose_rev = 0  # bumped by update_poses → position mirror refresh
        # keyframes whose masks were carved since the last mirror sync —
        # their mirror rows are re-uploaded lazily (carving is rare)
        self._dirty_rows: set[int] = set()

    def _alloc(self, name: str, shape, dtype):
        if self.storage_dir is None or name not in _DISK_FIELDS:
            return np.zeros(shape, dtype)
        path = os.path.join(self.storage_dir, name + ".dat")
        return np.memmap(path, dtype=dtype, mode="w+", shape=shape)

    def _grow_field(self, name: str, new_cap: int):
        arr = getattr(self, name)
        if isinstance(arr, np.memmap):
            # appending rows to a row-major memmap = extending the file
            path = arr.filename
            dtype = arr.dtype
            shape = (new_cap,) + arr.shape[1:]
            arr.flush()
            del arr
            nbytes = int(np.prod(shape)) * dtype.itemsize
            with open(path, "r+b") as f:
                f.truncate(nbytes)
            setattr(self, name, np.memmap(path, dtype=dtype, mode="r+", shape=shape))
        else:
            setattr(self, name, _grow(arr, new_cap))

    # -- insertion ----------------------------------------------------------

    def _ensure_kf_capacity(self, need: int):
        cap = self.stamps.shape[0]
        if need <= cap:
            return
        new = max(need, cap * 2)
        for name in (
            "stamps",
            "odom_poses",
            "map_poses",
            "edge_xyz",
            "edge_mask",
            "surf_xyz",
            "surf_mask",
            "sc",
            "ring_keys",
            "gnss_pos",
            "gnss_valid",
        ):
            self._grow_field(name, new)

    def _ensure_edge_capacity(self, need: int):
        cap = self.eij.shape[0]
        if need <= cap:
            return
        new = max(need, cap * 2)
        self.eij = _grow(self.eij, new)
        self.ez = _grow(self.ez, new)
        self.esqrtw = _grow(self.esqrtw, new)
        self.eloop = _grow(self.eloop, new)

    def add_keyframe(
        self,
        stamp: float,
        odom_pose,
        map_pose,
        edge_pb: PointBatch,
        surf_pb: PointBatch,
        sc=None,
        gnss_pos=None,
    ) -> int:
        """Store a keyframe (clouds in sensor frame). Returns its id.

        ``sc`` may be precomputed; otherwise it is built here from the
        concatenated feature clouds (reference computes it per keyframe at
        insertion, `SceneRecognitionScanContext.hpp:61-94`).
        """
        i = self.n_keyframes
        self._ensure_kf_capacity(i + 1)
        self.stamps[i] = float(stamp)
        self.odom_poses[i] = np.asarray(odom_pose, np.float32)
        self.map_poses[i] = np.asarray(map_pose, np.float32)

        if sc is None:
            # one fused device program + ONE batched transfer for clouds,
            # descriptor, and ring key together
            sc_d, rk_d = _sc_ringkey(
                edge_pb.xyz, edge_pb.mask, surf_pb.xyz, surf_pb.mask,
                self.sc_shape[0], self.sc_shape[1],
                min(edge_pb.xyz.shape[0], self.edge_capacity),
                min(surf_pb.xyz.shape[0], self.surf_capacity),
            )
            exyz, emask, sxyz, smask, sc_np, rk = jax.device_get(
                (edge_pb.xyz, edge_pb.mask, surf_pb.xyz, surf_pb.mask,
                 sc_d, rk_d)
            )
        else:
            exyz, emask, sxyz, smask = jax.device_get(
                (edge_pb.xyz, edge_pb.mask, surf_pb.xyz, surf_pb.mask)
            )
            sc_np = np.asarray(sc, np.float32)
            rk = np.asarray(scancontext.ring_key(jnp.asarray(sc_np)))

        ne = min(exyz.shape[0], self.edge_capacity)
        self.edge_xyz[i, :ne] = np.asarray(exyz, np.float32)[:ne]
        self.edge_mask[i, :ne] = np.asarray(emask)[:ne]
        ns = min(sxyz.shape[0], self.surf_capacity)
        self.surf_xyz[i, :ns] = np.asarray(sxyz, np.float32)[:ns]
        self.surf_mask[i, :ns] = np.asarray(smask)[:ns]
        self.sc[i] = np.asarray(sc_np, np.float32)
        self.ring_keys[i] = np.asarray(rk, np.float32)
        if gnss_pos is not None:
            self.gnss_pos[i] = np.asarray(gnss_pos, np.float32)
            self.gnss_valid[i] = True
        self.n_keyframes = i + 1
        return i

    def add_edge(self, i: int, j: int, z, noise=None, loop: bool = False) -> int:
        """Between-edge i→j with per-dim noise (σ²); information = 1/noise
        (reference `graph_optimization_g2o.cpp:108-183`). Default noise is
        the reference's hardcoded odometry noise [0.0025×3 trans, 1e-4×3 rot]
        (`backend_lifelong.hpp:456-475`). ``loop`` marks the edge as a loop
        closure: the graph solve applies its robust kernel only to loop
        edges (reference per-edge `SetEdgeRobustKernel`)."""
        if noise is None:
            noise = np.array([1e-4] * 3 + [0.0025] * 3)  # [rot, trans] order
        e = self.n_edges
        self._ensure_edge_capacity(e + 1)
        self.eij[e] = (i, j)
        self.ez[e] = np.asarray(z, np.float32)
        self.esqrtw[e] = 1.0 / np.sqrt(np.asarray(noise, np.float64))
        self.eloop[e] = bool(loop)
        self.n_edges = e + 1
        return e

    # -- queries ------------------------------------------------------------

    def keyframe_clouds(self, i: int) -> tuple[PointBatch, PointBatch]:
        return (
            PointBatch(jnp.asarray(self.edge_xyz[i]), jnp.asarray(self.edge_mask[i])),
            PointBatch(jnp.asarray(self.surf_xyz[i]), jnp.asarray(self.surf_mask[i])),
        )

    def positions(self) -> np.ndarray:
        return self.map_poses[: self.n_keyframes, 4:]

    def carve(self, i: int, edge_keep: np.ndarray, surf_keep: np.ndarray):
        """Permanently mask out points of keyframe ``i`` contradicted by
        later observations (dynamic-object carving, reference README TODO #4
        / static-change map update TODO #5). Masks only ever shrink."""
        self.edge_mask[i] &= np.asarray(edge_keep, bool)
        self.surf_mask[i] &= np.asarray(surf_keep, bool)
        self._dirty_rows.add(int(i))

    def local_map(
        self, center_id: int, half_window: int = 5
    ) -> tuple[PointBatch, PointBatch]:
        """Union of keyframes [center−h, center+h] transformed to map frame
        with current optimized poses — the reference's adjacent-id local map
        (`pose_graph_database.hpp:381-413`) minus its end-wraparound bug
        (Appendix A): ids are clamped, never wrapped."""
        lo = max(0, center_id - half_window)
        hi = min(self.n_keyframes - 1, center_id + half_window)
        return self.local_map_ids(np.arange(lo, hi + 1))

    def local_map_ids(self, ids: np.ndarray) -> tuple[PointBatch, PointBatch]:
        """Union local map of an arbitrary keyframe id set (used by the
        localization kNN assembly, `backend_lifelong.hpp:242-289`)."""
        ids = np.asarray(ids, np.int64)
        poses = jnp.asarray(self.map_poses[ids])  # (K,7)
        e_xyz = jnp.asarray(self.edge_xyz[ids])  # (K,E,3)
        s_xyz = jnp.asarray(self.surf_xyz[ids])
        e_w = se3.pose_apply(poses[:, None, :].repeat(e_xyz.shape[1], 1), e_xyz)
        s_w = se3.pose_apply(poses[:, None, :].repeat(s_xyz.shape[1], 1), s_xyz)
        edge = PointBatch(
            e_w.reshape(-1, 3), jnp.asarray(self.edge_mask[ids]).reshape(-1)
        )
        surf = PointBatch(
            s_w.reshape(-1, 3), jnp.asarray(self.surf_mask[ids]).reshape(-1)
        )
        return edge, surf

    def graph_arrays(
        self, pad_to_pow2: bool = True, pad_min: int = 0
    ) -> GraphArrays:
        """Padded device arrays for ``optimize_pose_graph`` (gauge = vertex 0).

        ``pad_min`` floors the padded vertex/edge capacity so the jitted
        solver does not recompile at every pow2 growth of a young graph."""
        V = max(self.n_keyframes, 1)
        E = max(self.n_edges, 1)
        if pad_to_pow2:
            V = max(1 << (V - 1).bit_length(), pad_min)
            E = max(1 << (E - 1).bit_length(), pad_min)
        poses = np.zeros((V, 7), np.float32)
        poses[:, 0] = 1.0
        poses[: self.n_keyframes] = self.map_poses[: self.n_keyframes]
        vmask = np.zeros(V, bool)
        vmask[: self.n_keyframes] = True
        eij = np.zeros((E, 2), np.int32)
        ez = np.zeros((E, 7), np.float32)
        ez[:, 0] = 1.0
        esw = np.zeros((E, 6), np.float32)
        emask = np.zeros(E, bool)
        erob = np.zeros(E, bool)
        eij[: self.n_edges] = self.eij[: self.n_edges]
        ez[: self.n_edges] = self.ez[: self.n_edges]
        esw[: self.n_edges] = self.esqrtw[: self.n_edges]
        emask[: self.n_edges] = True
        erob[: self.n_edges] = self.eloop[: self.n_edges]
        return GraphArrays(
            jnp.asarray(poses),
            jnp.asarray(vmask),
            jnp.asarray(eij),
            jnp.asarray(ez),
            jnp.asarray(esw),
            jnp.asarray(emask),
            jnp.asarray(erob),
        )

    def update_poses(self, optimized: np.ndarray):
        """Write back optimized poses for all keyframes (full 7-dof — the
        reference's z-drop bug `pose_graph_database.hpp:449-451` is not
        replicated)."""
        self.map_poses[: self.n_keyframes] = np.asarray(
            optimized[: self.n_keyframes], np.float32
        )
        self._pose_rev += 1

    def update_poses_range(self, start: int, optimized: np.ndarray):
        """Write back a contiguous pose slice ``[start, start+len)`` — the
        window-local incremental solve touches only its free window."""
        stop = min(start + optimized.shape[0], self.n_keyframes)
        self.map_poses[start:stop] = np.asarray(
            optimized[: stop - start], np.float32
        )
        self._pose_rev += 1

    # -- device search mirror -------------------------------------------------

    def _mirror_sync(self) -> dict:
        """Bring the device mirror up to date. Costs: a full upload only on
        capacity growth (pow2, so ≤ log2 N times ever); otherwise one small
        H2D of the delta rows (descriptors + feature clouds, ~65 KB per new
        keyframe); a poses refresh after each optimize (a few KB); a mask
        re-upload for rows carved since the last sync."""
        n = self.n_keyframes
        cap = max(1 << max(n - 1, 0).bit_length(), self.mirror_min_cap)
        m = self._mirror
        if m is None or m["cap"] < cap:
            sc = np.zeros((cap,) + self.sc_shape, np.float32)
            rk = np.zeros((cap, self.sc_shape[0]), np.float32)
            poses = np.zeros((cap, 7), np.float32)
            poses[:, 0] = 1.0
            exyz = np.zeros((cap, self.edge_capacity, 3), np.float32)
            emk = np.zeros((cap, self.edge_capacity), bool)
            sxyz = np.zeros((cap, self.surf_capacity, 3), np.float32)
            smk = np.zeros((cap, self.surf_capacity), bool)
            sc[:n] = self.sc[:n]
            rk[:n] = self.ring_keys[:n]
            poses[:n] = self.map_poses[:n]
            exyz[:n] = self.edge_xyz[:n]
            emk[:n] = self.edge_mask[:n]
            sxyz[:n] = self.surf_xyz[:n]
            smk[:n] = self.surf_mask[:n]
            m = dict(
                cap=cap,
                n=n,
                pose_rev=self._pose_rev,
                sc=jnp.asarray(sc),
                rk=jnp.asarray(rk),
                poses=jnp.asarray(poses),
                pos=jnp.asarray(poses[:, 4:].copy()),
                exyz=jnp.asarray(exyz),
                emk=jnp.asarray(emk),
                sxyz=jnp.asarray(sxyz),
                smk=jnp.asarray(smk),
                valid=jnp.arange(cap) < n,
            )
            self._mirror = m
            self._dirty_rows.clear()
            return m
        if m["n"] < n:
            # one fused dispatch per new keyframe (usually exactly one)
            for i in range(m["n"], n):
                (m["sc"], m["rk"], m["poses"], m["pos"],
                 m["exyz"], m["emk"], m["sxyz"], m["smk"]) = _mirror_append_row(
                    m["sc"], m["rk"], m["poses"], m["pos"],
                    m["exyz"], m["emk"], m["sxyz"], m["smk"],
                    jnp.asarray(self.sc[i], jnp.float32),
                    jnp.asarray(self.ring_keys[i], jnp.float32),
                    jnp.asarray(self.map_poses[i], jnp.float32),
                    jnp.asarray(self.edge_xyz[i], jnp.float32),
                    jnp.asarray(self.edge_mask[i]),
                    jnp.asarray(self.surf_xyz[i], jnp.float32),
                    jnp.asarray(self.surf_mask[i]),
                    i,
                )
            m["valid"] = jnp.arange(m["cap"]) < n
            self._dirty_rows -= set(range(m["n"], n))
            m["n"] = n
        if m["pose_rev"] != self._pose_rev:
            poses = np.zeros((m["cap"], 7), np.float32)
            poses[:, 0] = 1.0
            poses[:n] = self.map_poses[:n]
            m["poses"], m["pos"] = _mirror_refresh_poses(jnp.asarray(poses))
            m["pose_rev"] = self._pose_rev
        if self._dirty_rows:
            for i in sorted(self._dirty_rows):
                if i >= m["n"]:
                    continue
                m["emk"], m["smk"] = _mirror_update_masks(
                    m["emk"], m["smk"],
                    jnp.asarray(self.edge_mask[i]),
                    jnp.asarray(self.surf_mask[i]),
                    i,
                )
            self._dirty_rows.clear()
        return m

    def local_map_ids_device(
        self, ids: np.ndarray, k: int
    ) -> tuple[PointBatch, PointBatch]:
        """Device-resident fixed-K local map: pad ``ids`` to ``k`` entries
        (masked tail) and assemble the union map in ONE static-shape kernel
        over the resident cloud mirror. Cost per call: a K-int upload; no
        per-call cloud transfer, no shape-dependent recompiles (one compile
        per (capacity, K) pair, capacity pow2)."""
        ids = np.asarray(ids, np.int32)[:k]
        idp = np.zeros(k, np.int32)
        idm = np.zeros(k, bool)
        idp[: ids.size] = ids
        idm[: ids.size] = True
        m = self._mirror_sync()
        ew, em, sw, sm = _gather_local_map(
            m["exyz"], m["emk"], m["sxyz"], m["smk"], m["poses"],
            jnp.asarray(idp), jnp.asarray(idm),
        )
        return PointBatch(ew, em), PointBatch(sw, sm)

    def local_map_knn_device(
        self, query_xyz, k: int, max_id: int | None = None
    ) -> tuple[PointBatch, PointBatch]:
        """kNN local map in ONE fused dispatch: top-k over the resident
        position mirror feeds the cloud gather directly on device (the ids
        never come to the host) — the localization-path replacement for
        ``nearest_ids`` + ``local_map_ids`` (reference kNN local map,
        `backend_lifelong.hpp:242-289`)."""
        m = self._mirror_sync()
        kk = min(k, m["cap"])
        ew, em, sw, sm = _knn_gather_local_map(
            m["exyz"], m["emk"], m["sxyz"], m["smk"], m["poses"],
            m["pos"], m["valid"],
            jnp.asarray(query_xyz, jnp.float32),
            jnp.int32(self.n_keyframes if max_id is None else max_id),
            kk,
        )
        return PointBatch(ew, em), PointBatch(sw, sm)

    def local_map_device(
        self, center_id: int, half_window: int = 5
    ) -> tuple[PointBatch, PointBatch]:
        """Fixed-K device flavor of :meth:`local_map` (K = 2·half_window+1,
        ids clamped to the valid range, tail masked)."""
        lo = max(0, center_id - half_window)
        hi = min(self.n_keyframes - 1, center_id + half_window)
        return self.local_map_ids_device(
            np.arange(lo, hi + 1), 2 * half_window + 1
        )

    def descriptor_arrays(self):
        """(sc (N,R,S), ring_keys (N,R), valid (N,)) — persistent device
        arrays (pow2 capacity), appended incrementally on ``add_keyframe``."""
        m = self._mirror_sync()
        return m["sc"], m["rk"], m["valid"]

    def nearest_ids(
        self, query_xyz, k: int, max_id: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """k nearest keyframes to ``query_xyz`` by optimized position —
        one device top-k over the resident position mirror (replaces the
        reference's pcl kdtree `HistoricalPositionSearch`,
        `loopDetection.hpp:225-244`). Returns (ids, distances) as numpy,
        nearest first; entries with infinite distance are filtered out."""
        m = self._mirror_sync()
        kk = min(k, m["cap"])
        ids, d = _mirror_knn(
            m["pos"],
            m["valid"],
            jnp.asarray(query_xyz, jnp.float32),
            jnp.int32(self.n_keyframes if max_id is None else max_id),
            kk,
        )
        ids, d = np.asarray(ids), np.asarray(d)
        keep = np.isfinite(d)
        return ids[keep], d[keep]

    # -- persistence (the lifelong checkpoint) -------------------------------

    def _field_spec(self, name):
        ec, sc_ = self.edge_capacity, self.surf_capacity
        return {
            "edge_xyz": ((ec, 3), np.float32),
            "edge_mask": ((ec,), np.bool_),
            "surf_xyz": ((sc_, 3), np.float32),
            "surf_mask": ((sc_,), np.bool_),
            "sc": (self.sc_shape, np.float32),
        }[name]

    def save(self, path: str):
        """Checkpoint of the whole lifelong database (reference: text
        vertices/edges + pose PCDs + per-KF PCDs + descriptor text DB,
        `pose_graph_database.hpp:40-59`).

        RAM mode: one self-contained npz. Disk mode (``storage_dir``):
        INCREMENTAL — memmaps are flushed in place and the npz carries only
        the small graph arrays, so checkpoint cost is independent of the
        number of stored clouds."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        n, e = self.n_keyframes, self.n_edges
        small = dict(
            version=2,
            stamps=self.stamps[:n],
            odom_poses=self.odom_poses[:n],
            map_poses=self.map_poses[:n],
            ring_keys=self.ring_keys[:n],
            eij=self.eij[:e],
            ez=self.ez[:e],
            esqrtw=self.esqrtw[:e],
            eloop=self.eloop[:e],
            gnss_pos=self.gnss_pos[:n],
            gnss_valid=self.gnss_valid[:n],
            edge_capacity=self.edge_capacity,
            surf_capacity=self.surf_capacity,
            sc_shape=np.asarray(self.sc_shape),
        )
        if self.storage_dir is not None:
            for name in _DISK_FIELDS:
                getattr(self, name).flush()
            np.savez_compressed(
                path,
                storage="memmap",
                payload_dir=os.path.abspath(self.storage_dir),
                **small,
            )
        else:
            np.savez_compressed(
                path,
                storage="ram",
                edge_xyz=self.edge_xyz[:n],
                edge_mask=self.edge_mask[:n],
                surf_xyz=self.surf_xyz[:n],
                surf_mask=self.surf_mask[:n],
                sc=self.sc[:n],
                **small,
            )

    @classmethod
    def load(cls, path: str, storage_dir: str | None = None) -> "KeyframeDatabase":
        """Boot a database from a checkpoint.

        Disk-backed (memmap) checkpoints: the payload ``.dat`` files are
        located via the checkpoint's recorded ``payload_dir`` (fallback: the
        checkpoint's own directory) and COPIED into the new session's
        ``storage_dir`` (default: ``<path minus extension>_session``), so a
        saved checkpoint stays immutable — a crash mid-session can never
        corrupt the only copy. Pass ``storage_dir`` equal to the payload
        directory to explicitly resume in place.
        """
        z = np.load(path)
        storage = str(z["storage"]) if "storage" in z else "ram"
        n = z["stamps"].shape[0]
        e = z["eij"].shape[0]
        if storage == "memmap":
            source_dir = str(z["payload_dir"]) if "payload_dir" in z else ""
            if not source_dir or not os.path.isdir(source_dir):
                source_dir = os.path.dirname(os.path.abspath(path))
            if storage_dir is None:
                storage_dir = os.path.splitext(os.path.abspath(path))[0] + "_session"
            sc_shape = tuple(int(x) for x in z["sc_shape"])
            db = cls(
                edge_capacity=int(z["edge_capacity"]),
                surf_capacity=int(z["surf_capacity"]),
                initial_keyframes=max(n, 1),
                sc_rings=sc_shape[0],
                sc_sectors=sc_shape[1],
            )
            in_place = os.path.abspath(storage_dir) == os.path.abspath(source_dir)
            if not in_place:
                os.makedirs(storage_dir, exist_ok=True)
            db.storage_dir = storage_dir
            for name in _DISK_FIELDS:
                row_shape, dtype = db._field_spec(name)
                src = os.path.join(source_dir, name + ".dat")
                row_bytes = int(np.prod(row_shape)) * np.dtype(dtype).itemsize
                cap = os.path.getsize(src) // row_bytes
                if cap < n:
                    raise ValueError(f"{src} holds {cap} rows < {n} keyframes")
                fpath = os.path.join(storage_dir, name + ".dat")
                if not in_place:
                    shutil.copyfile(src, fpath)
                setattr(
                    db,
                    name,
                    np.memmap(fpath, dtype=dtype, mode="r+", shape=(cap,) + row_shape),
                )
        else:
            db = cls(
                edge_capacity=z["edge_xyz"].shape[1],
                surf_capacity=z["surf_xyz"].shape[1],
                initial_keyframes=max(n, 1),
                sc_rings=z["sc"].shape[1],
                sc_sectors=z["sc"].shape[2],
            )
            for name in _DISK_FIELDS:
                getattr(db, name)[:n] = z[name]
        db.n_keyframes = n
        for name in ("stamps", "odom_poses", "map_poses", "ring_keys"):
            getattr(db, name)[:n] = z[name]
        if "gnss_pos" in z:
            db.gnss_pos[:n] = z["gnss_pos"]
            db.gnss_valid[:n] = z["gnss_valid"]
        db._ensure_edge_capacity(max(e, 1))
        db.n_edges = e
        db.eij[:e] = z["eij"]
        db.ez[:e] = z["ez"]
        db.esqrtw[:e] = z["esqrtw"]
        if "eloop" in z:
            db.eloop[:e] = z["eloop"]
        return db
