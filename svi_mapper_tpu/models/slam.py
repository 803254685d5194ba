"""Full SLAM system: tracking front-end + loop closure + back-end optimization.

The TPU-native equivalent of the complete ``CTrackerSV`` pipeline
(CTrackerSV.cpp:239-456): per-frame visual odometry (models.frame), keyframe
spawning, loop-closure search over the keyframe database with consensus
checking, trajectory-only pose-graph relaxation, and windowed
Schur-complement bundle adjustment with back-propagation of the corrections
into the live tracking state (the reference's
``_backPropagateTrajectoryToFull`` / ``_applyOptimizationToLandmarks``
family, Cg2oOptimizer.cpp:1468-1636).

Host/device split: the device runs every dense computation (frame step,
pool scoring, ICP, consensus chi^2, pose graph, BA); the host only keeps
the keyframe list, decides when to run the back-end, and shuffles small
pose/uid arrays.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from svi_mapper_tpu.config import DEFAULT_PARAMS, TrackingParams
from svi_mapper_tpu.geometry.camera import StereoCamera
from svi_mapper_tpu.mapping import closure as closure_mod
from svi_mapper_tpu.models import frame as frame_mod
from svi_mapper_tpu.models.tracker import StereoTracker
from svi_mapper_tpu.solvers import ba as ba_mod
from svi_mapper_tpu.solvers import pose_graph as pg_mod


@dataclasses.dataclass
class SLAMKeyframe:
    """Host keyframe record: pose + BA observations + closure pool."""

    index: int
    frame_idx: int
    T_wc: np.ndarray            # [4,4] current best estimate (updated by BA/PG)
    obs_uids: np.ndarray        # [n] tracked landmark uids at this frame
    obs_uv4: np.ndarray         # [n,4] their stereo measurements
    pool_uids: np.ndarray       # [m] optimal landmarks in the closure pool


@dataclasses.dataclass
class ClosureEdge:
    ref_kf: int
    query_kf: int
    T_qr: np.ndarray
    accepted: bool = False


class SLAMSystem(StereoTracker):
    """Stereo SLAM with loop closure and windowed BA."""

    def __init__(
        self,
        cam: StereoCamera,
        params: TrackingParams = DEFAULT_PARAMS,
        use_gt_pose: bool = False,
        enable_loop_closure: bool = True,
        enable_local_ba: bool = True,
        ba_window: int = 8,
        ba_max_points: int = 1024,
        consensus_window: int = 8,
        max_keyframes: int = 512,
        pool_size: int = 256,
        native_index: bool = False,
        async_closure: bool = False,
        graph_snapshot_dir: str | None = None,
    ):
        super().__init__(cam, params, use_gt_pose=use_gt_pose)
        self.enable_loop_closure = enable_loop_closure
        self.enable_local_ba = enable_local_ba
        self.ba_window = ba_window
        self.ba_max_points = ba_max_points
        self.consensus_window = consensus_window
        self.db = closure_mod.KeyframeDatabase.create(
            max_keyframes, pool_size, native_index=native_index
        )
        self.slam_keyframes: list[SLAMKeyframe] = []
        self.closure_candidates: list[ClosureEdge] = []
        self.accepted_closures: list[ClosureEdge] = []
        self.stats = {"closures_found": 0, "closures_accepted": 0, "ba_runs": 0,
                      "pose_graph_runs": 0}
        # async loop closure: the reference searches closures INLINE in the
        # frame loop (CTrackerGT.cpp:257); here the search (BoW-analog pool
        # scoring + ICP validation — the expensive, read-only part) runs on
        # a worker thread over an immutable database snapshot, and results
        # are folded in at the next keyframe boundary (SURVEY.md §7 "loop
        # closure runs async to avoid stalling tracking")
        # per-optimization g2o snapshots (ref keyframes_*-*.g2o,
        # Cg2oOptimizer.cpp:493-514)
        self.graph_snapshot_dir = graph_snapshot_dir
        self._closure_pool = None
        self._pending_closures: list = []
        if async_closure:
            from concurrent.futures import ThreadPoolExecutor

            self._closure_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="loop-closure")

    # ------------------------------------------------------------------
    def process(self, img_left, img_right, T_gt=None):
        out = super().process(img_left, img_right, T_gt=T_gt)
        if bool(out.is_keyframe):
            self._on_keyframe(out)
        return out

    # ------------------------------------------------------------------
    def _on_keyframe(self, out) -> None:
        t = self.state.table
        active = np.asarray(t.active)
        tracked_uv = np.asarray(t.uv_left_last)
        disparity = np.asarray(t.disparity_last)
        uids = np.asarray(t.uid)
        pos_w = np.asarray(t.pos_w)
        desc = np.asarray(t.desc_left_ref)
        optimal = np.asarray(t.is_optimal)
        failed = np.asarray(t.failed)
        T_wc = np.asarray(self.state.T_wc)

        # observations for BA: landmarks tracked THIS frame (failed == 0)
        obs_sel = active & (failed == 0)
        uv4 = np.concatenate(
            [tracked_uv, tracked_uv[:, :1] - disparity[:, None], tracked_uv[:, 1:2]],
            axis=1,
        )
        kf = SLAMKeyframe(
            index=len(self.slam_keyframes),
            frame_idx=self.frame_count - 1,
            T_wc=T_wc.copy(),
            obs_uids=uids[obs_sel].copy(),
            obs_uv4=uv4[obs_sel].copy(),
            pool_uids=uids[active & optimal].copy(),
        )
        self.slam_keyframes.append(kf)

        # closure pool: camera-frame points + descriptors of optimal landmarks
        pool_sel = active & optimal
        R, tt = T_wc[:3, :3], T_wc[:3, 3]
        p_cam = pos_w[pool_sel] @ R.T + tt
        self.db.add(desc[pool_sel], p_cam, T_wc)

        if self.enable_loop_closure:
            self._detect_closures(kf)
        if self.enable_local_ba and len(self.slam_keyframes) >= 2:
            self._local_ba()
        # keep the recorded trajectory piecewise-consistent: after back-end
        # corrections the live pose changed; the keyframe's trajectory entry
        # must be the CORRECTED pose so each inter-keyframe segment is
        # internally consistent and anchors exactly at raw[kf.frame_idx]
        self.trajectory[-1] = np.asarray(self.state.T_wc)

    # ------------------------------------------------------------------
    def _find_closures(self, db: closure_mod.KeyframeDatabase, kf_index: int):
        """Pure search stage (runs on the worker thread in async mode)."""
        return closure_mod.find_closures(
            db, kf_index,
            min_matches=self.params.closure_min_matches,
            min_relative=self.params.closure_min_relative_matches,
            hamming_cutoff=self.params.closure_hamming_cutoff,
            icp_kwargs=dict(
                inlier_m2=self.params.closure_icp_inlier_m,
                min_inliers=self.params.closure_icp_min_inliers,
                max_avg_error=self.params.closure_icp_max_error,
            ),
        )

    def _detect_closures(self, kf: SLAMKeyframe) -> None:
        if self._closure_pool is not None:
            # fold in whatever earlier searches have finished, then kick off
            # this keyframe's search on the worker over a snapshot
            self.flush_closures(block=False)
            snap = self.db.snapshot()
            self._pending_closures.append(
                (kf.index, self._closure_pool.submit(
                    self._find_closures, snap, kf.index)))
            return
        self._apply_found_closures(self._find_closures(self.db, kf.index),
                                   kf.index)

    def flush_closures(self, block: bool = True) -> None:
        """Fold finished async closure searches into the graph; with
        ``block=True`` wait for all pending ones first (call before reading
        final results or checkpointing)."""
        if self._closure_pool is None:
            return
        still = []
        for (idx, fut) in self._pending_closures:
            if fut.done() or block:
                self._apply_found_closures(fut.result(), idx)
            else:
                still.append((idx, fut))
        self._pending_closures = still

    def _apply_found_closures(self, found, kf_index: int) -> None:
        self.stats["closures_found"] += len(found)
        for c in found:
            self.closure_candidates.append(
                ClosureEdge(ref_kf=c.ref_kf, query_kf=c.query_kf, T_qr=c.T_qr)
            )
        # windowed consensus over recent candidates
        # (ref ClosureBuffer + LoopClosureChecker, Cg2oOptimizer.cpp:267-325)
        window = [
            c for c in self.closure_candidates
            if c.query_kf >= kf_index - self.consensus_window and not c.accepted
        ]
        if not window:
            return
        newly = []
        if len(window) == 1:
            # single candidate: accept on ICP validity alone once it has
            # strong support (the reference requires >= 1 consensus inlier;
            # a lone candidate trivially agrees with itself)
            window[0].accepted = True
            newly = [window[0]]
        else:
            M = jnp.asarray(np.stack([c.T_qr for c in window]), jnp.float32)
            T_i = jnp.asarray(
                np.stack([self.slam_keyframes[c.ref_kf].T_wc for c in window]), jnp.float32)
            T_j = jnp.asarray(
                np.stack([self.slam_keyframes[c.query_kf].T_wc for c in window]), jnp.float32)
            chi2 = closure_mod.consensus_matrix(M, T_i, T_j, jnp.ones(len(window), bool))
            accept, _ = closure_mod.consensus_filter(
                chi2, jnp.ones(len(window), bool),
                threshold=self.params.closure_consensus_chi2,
            )
            for c, a in zip(window, np.asarray(accept)):
                if a:
                    c.accepted = True
                    newly.append(c)
        if newly:
            self.accepted_closures.extend(newly)
            self.stats["closures_accepted"] += len(newly)
            self._snapshot_graph("pre")
            self._optimize_pose_graph()
            self._snapshot_graph("post")

    def _snapshot_graph(self, tag: str) -> None:
        """g2o snapshot around each optimization (ref Cg2oOptimizer.cpp:493-514)."""
        if not self.graph_snapshot_dir or not self.slam_keyframes:
            return
        from pathlib import Path

        from svi_mapper_tpu.io.g2o_export import snapshot_slam

        d = Path(self.graph_snapshot_dir)
        d.mkdir(parents=True, exist_ok=True)
        n = len(self.slam_keyframes)
        snapshot_slam(self, d / f"keyframes_0-{n - 1}_{tag}.g2o")

    # ------------------------------------------------------------------
    def _optimize_pose_graph(self) -> None:
        """Trajectory-only relaxation over ALL keyframes + accepted closures
        (the reference's trajectory graph, Cg2oOptimizer.cpp:342-377)."""
        N = len(self.slam_keyframes)
        if N < 2:
            return
        T = np.stack([k.T_wc for k in self.slam_keyframes]).astype(np.float32)
        ei, ej, Ms, ws = [], [], [], []
        for k in range(1, N):
            M = (T[k] @ np.linalg.inv(T[k - 1])).astype(np.float32)
            ei.append(k - 1); ej.append(k); Ms.append(M)
            ws.append(float(pg_mod.sequential_edge_weight(jnp.asarray(M))))
        for c in self.accepted_closures:
            ei.append(c.ref_kf); ej.append(c.query_kf)
            Ms.append(c.T_qr.astype(np.float32)); ws.append(1.0)
        edges = pg_mod.PoseGraphEdges(
            i=jnp.asarray(ei, jnp.int32), j=jnp.asarray(ej, jnp.int32),
            T_ij=jnp.asarray(np.stack(Ms)), weight=jnp.asarray(ws, jnp.float32),
            valid=jnp.ones(len(ei), bool),
        )
        fix = np.zeros(N, bool); fix[0] = True
        res = pg_mod.optimize_pose_graph(jnp.asarray(T), edges, jnp.asarray(fix))
        T_opt = np.asarray(res.T_wc)
        self.stats["pose_graph_runs"] += 1
        if not np.isfinite(T_opt).all() or float(res.chi2_final) > float(res.chi2_initial):
            self.stats["pose_graph_rejected"] = self.stats.get("pose_graph_rejected", 0) + 1
            return
        # write back + propagate the last-keyframe correction to live state
        G = self._world_correction(T[-1], T_opt[-1])
        for k, kf in enumerate(self.slam_keyframes):
            kf.T_wc = T_opt[k]
        self.db.T_wc = jnp.asarray(
            np.concatenate([T_opt, np.asarray(self.db.T_wc)[N:]], axis=0),
            jnp.float32,
        )
        self._apply_world_correction(T[-1], T_opt[-1])

    # ------------------------------------------------------------------
    def _attach_live_to_keyframe(self, T_kf_old: np.ndarray, T_kf_new: np.ndarray) -> None:
        """Rigidly attach the live pose chain to a corrected keyframe pose:
        T_live_new inv(T_kf_new) == T_live_old inv(T_kf_old). Used after BA,
        where landmarks are updated directly and only the live pose must
        follow (ref back-propagation of the BA result into the tracker pose,
        CTrackerSV.cpp:454-456)."""
        A = jnp.asarray(np.linalg.inv(T_kf_old) @ T_kf_new, jnp.float32)
        self.state = self.state.replace(
            T_wc=self.state.T_wc @ A,
            T_wc_prev=self.state.T_wc_prev @ A,
            T_last_keyframe=self.state.T_last_keyframe @ A,
        )

    @staticmethod
    def _world_correction(T_old: np.ndarray, T_new: np.ndarray) -> np.ndarray:
        """G: world-frame map correction st. camera-frame geometry at the
        last keyframe is preserved: p_w_new = G p_w_old."""
        return np.linalg.inv(T_new) @ T_old

    def _apply_world_correction(self, T_old: np.ndarray, T_new: np.ndarray) -> None:
        """Rigidly move the live map/state into the corrected world frame
        (the batched analog of _backPropagateTrajectoryToFull +
        _applyOptimizationToLandmarks, Cg2oOptimizer.cpp:1468-1603)."""
        G = self._world_correction(T_old, T_new)        # p_w_new = G p_w_old
        Gj = jnp.asarray(G, jnp.float32)
        t = self.state.table
        pos_new = t.pos_w @ Gj[:3, :3].T + Gj[:3, 3]
        # every world->camera transform X must satisfy p_c invariance:
        # X_new = X_old G^-1  (then X_new p_w_new == X_old p_w_old)
        Ginv = jnp.asarray(np.linalg.inv(G), jnp.float32)
        meas_T_new = jnp.einsum("lmij,jk->lmik", t.meas_T_wc, Ginv)
        self.state = self.state.replace(
            T_wc=self.state.T_wc @ Ginv,
            T_wc_prev=self.state.T_wc_prev @ Ginv,
            T_last_keyframe=self.state.T_last_keyframe @ Ginv,
            table=t.replace(pos_w=pos_new, meas_T_wc=meas_T_new),
        )
        # the returned per-frame trajectory list keeps raw VO poses; the
        # OPTIMIZED trajectory is reconstructed via optimized_trajectory()

    # ------------------------------------------------------------------
    def _local_ba(self) -> None:
        """Windowed Schur BA over the last ``ba_window`` keyframes
        (the full-graph stage, Cg2oOptimizer.cpp:394-522)."""
        kfs = self.slam_keyframes[-self.ba_window:]
        K = len(kfs)
        if K < 2:
            return
        # union of observed uids across the window, capped
        uid_set: dict[int, int] = {}
        for kf in kfs:
            for u in kf.obs_uids:
                if int(u) not in uid_set:
                    uid_set[int(u)] = len(uid_set)
        if len(uid_set) < 8:
            return
        uids = np.fromiter(uid_set.keys(), dtype=np.int64)[: self.ba_max_points]
        col = {int(u): i for i, u in enumerate(uids)}
        L = len(uids)

        obs = np.zeros((K, L, 4), np.float32)
        mask = np.zeros((K, L), bool)
        for k, kf in enumerate(kfs):
            for u, uv in zip(kf.obs_uids, kf.obs_uv4):
                c = col.get(int(u))
                if c is not None:
                    obs[k, c] = uv
                    mask[k, c] = True
        # landmarks observed in >= 2 keyframes constrain the window
        seen = mask.sum(0)
        mask &= (seen >= 2)[None, :]
        # density gate: an under-constrained window lets BA run wild
        if mask.sum() < 20 * K:
            return

        # current landmark positions by uid lookup in the live table
        t = self.state.table
        table_uids = np.asarray(t.uid)
        table_pos = np.asarray(t.pos_w)
        uid_to_slot = {int(u): s for s, u in enumerate(table_uids) if u >= 0}
        X0 = np.zeros((L, 3), np.float32)
        have = np.zeros(L, bool)
        for u, c in col.items():
            s = uid_to_slot.get(u)
            if s is not None:
                X0[c] = table_pos[s]
                have[c] = True
        mask &= have[None, :]
        if mask.sum() < 24:
            return

        T0 = np.stack([kf.T_wc for kf in kfs]).astype(np.float32)
        fix = np.zeros(K, bool); fix[0] = True
        res = ba_mod.bundle_adjust(
            jnp.asarray(T0), jnp.asarray(X0), jnp.asarray(obs), jnp.asarray(mask),
            self.cam, jnp.asarray(fix),
            kernel_px2=self.params.posit_kernel_px2,
        )
        self.stats["ba_runs"] += 1
        if not np.isfinite(float(res.chi2_final)) or float(res.chi2_final) > float(res.chi2_initial):
            return
        T_opt = np.asarray(res.T_wc)
        X_opt = np.asarray(res.points_w)
        # sanity gate on the correction magnitude (the BA analog of the
        # posit RISK check, CSolverStereoPosit.h:89-98): a window BA must
        # not teleport keyframes
        if np.abs(T_opt - T0).max() > 0.5:
            self.stats["ba_rejected"] = self.stats.get("ba_rejected", 0) + 1
            return

        # write back keyframe poses
        for k, kf in enumerate(kfs):
            kf.T_wc = T_opt[k]
        # write back landmark positions (only BA'd, still-live landmarks)
        slots, newpos = [], []
        used = mask.any(0)
        for u, c in col.items():
            if used[c]:
                s = uid_to_slot.get(u)
                if s is not None:
                    slots.append(s); newpos.append(X_opt[c])
        if slots:
            slots_j = jnp.asarray(np.asarray(slots, np.int32))
            pos_j = jnp.asarray(np.stack(newpos), jnp.float32)
            # BA'd landmarks also get their measurement rings cleared — the
            # stored observation poses predate the correction and would make
            # the per-frame landmark GN fight the BA result (the reference
            # clears measurement histories on optimization,
            # CLandmark::clearMeasurements CLandmark.cpp:299)
            self.state = self.state.replace(
                table=t.replace(
                    pos_w=t.pos_w.at[slots_j].set(pos_j),
                    meas_count=t.meas_count.at[slots_j].set(0),
                    meas_next=t.meas_next.at[slots_j].set(0),
                )
            )
        # attach the live pose rigidly to the corrected last keyframe
        # (landmarks were updated DIRECTLY by BA above — no map transform)
        self._attach_live_to_keyframe(T0[-1], T_opt[-1])

    # ------------------------------------------------------------------
    def optimized_trajectory(self) -> np.ndarray:
        """Per-frame trajectory with keyframe corrections interpolated:
        each frame's raw VO pose is corrected by its most recent keyframe's
        accumulated optimization delta."""
        self.flush_closures(block=True)   # no-op in synchronous mode
        raw = self.trajectory_array
        if not self.slam_keyframes:
            return raw
        out = raw.copy()
        kf_frames = [kf.frame_idx for kf in self.slam_keyframes]
        # original (spawn-time) poses are the raw trajectory at those frames
        for i in range(len(raw)):
            # find latest keyframe at or before frame i
            k = int(np.searchsorted(kf_frames, i, side="right")) - 1
            if k < 0:
                continue
            kf = self.slam_keyframes[k]
            # anchor = the recorded (post-spawn-correction) keyframe pose;
            # rigid attachment: out[i] inv(kf.T_wc) == raw[i] inv(anchor)
            anchor = raw[kf.frame_idx]
            out[i] = raw[i] @ np.linalg.inv(anchor) @ kf.T_wc
        return out
