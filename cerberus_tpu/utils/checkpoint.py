"""Checkpoint / resume of estimator state.

The reference has no persistence at all — a crash loses the trajectory
(SURVEY.md §5). Here the full sliding-window state (poses, biases, rho,
extrinsics, marginalization prior + linearization point, feature slots,
interval buffers) round-trips through orbax/npz so a run can resume
mid-trajectory.
"""

from __future__ import annotations

import os

import numpy as np


def save_estimator(est, path: str):
    """Serialize an Estimator to a single .npz (atomic rename)."""
    fm = est.fm
    payload = dict(
        p=est.p, q=est.q, v=est.v, ba=est.ba, bg=est.bg, rho=est.rho,
        tic=est.tic, qic=est.qic, td=np.asarray(est.td),
        headers=est.headers, frame_count=np.asarray(est.frame_count),
        solver_flag=np.asarray(est.solver_flag),
        open_ex=np.asarray(est.open_ex_estimation),
        fm_active=fm.active, fm_ids=fm.ids, fm_start=fm.start, fm_obs=fm.obs,
        fm_stereo=fm.stereo, fm_pts=fm.pts, fm_pts_r=fm.pts_r, fm_vel=fm.vel,
        fm_vel_r=fm.vel_r, fm_td=fm.td, fm_depth=fm.depth,
    )
    if est.prior is not None:
        pj, pr, lin = est.prior[:3]
        payload["prior_J"] = np.asarray(pj)
        payload["prior_r"] = np.asarray(pr)
        payload["prior_valid"] = np.asarray(
            est.prior[3] if len(est.prior) > 3 else True)
        for k in ("p", "q", "v", "ba", "bg", "rho", "tic", "qic"):
            payload[f"prior_lin_{k}"] = np.asarray(getattr(lin, k))
        payload["prior_lin_td"] = np.asarray(lin.td)
    for k in range(10):
        buf = est.buffers[k]
        if buf is not None and len(buf):
            payload[f"buf{k}_t"] = np.asarray(buf.t)
            for f in ("acc", "gyr", "phi", "dphi", "c"):
                payload[f"buf{k}_{f}"] = np.stack(getattr(buf, f))
    # in-flight samples not yet closed into an interval
    if est.sync is not None and est.prev_img_t is not None:
        latest = est.sync.latest_time()
        if latest > est.prev_img_t:
            rows = est.sync.extract(est.prev_img_t, latest)
            if rows is not None and len(rows):
                payload["pending_rows"] = rows
        payload["prev_img_t"] = np.asarray(est.prev_img_t)
    elif len(est.pending):
        rows = np.concatenate([
            np.asarray(est.pending.t)[:, None], np.stack(est.pending.acc),
            np.stack(est.pending.gyr), np.stack(est.pending.phi),
            np.stack(est.pending.dphi), np.stack(est.pending.c)], axis=1)
        payload["pending_rows"] = rows
    tmp = path + ".tmp"
    np.savez_compressed(tmp, **payload)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_estimator(est, path: str):
    """Restore state saved by save_estimator into an Estimator instance
    (must be constructed with the same config/capacities)."""
    import jax.numpy as jnp

    from cerberus_tpu.estimator.estimator import IntervalBuffer
    from cerberus_tpu.ops import factors as fac

    z = np.load(path, allow_pickle=False)
    for k in ("p", "q", "v", "ba", "bg", "rho", "tic", "qic", "headers"):
        getattr(est, k)[...] = z[k]
    est.td = float(z["td"])
    est.frame_count = int(z["frame_count"])
    est.solver_flag = int(z["solver_flag"])
    est.open_ex_estimation = bool(z["open_ex"])
    fm = est.fm
    fm.active[...] = z["fm_active"]
    fm.ids[...] = z["fm_ids"]
    fm.start[...] = z["fm_start"]
    fm.obs[...] = z["fm_obs"]
    fm.stereo[...] = z["fm_stereo"]
    fm.pts[...] = z["fm_pts"]
    fm.pts_r[...] = z["fm_pts_r"]
    fm.vel[...] = z["fm_vel"]
    fm.vel_r[...] = z["fm_vel_r"]
    fm.td[...] = z["fm_td"]
    fm.depth[...] = z["fm_depth"]
    fm.id_to_slot = {int(fm.ids[s]): int(s)
                     for s in np.nonzero(fm.active)[0]}
    if "prior_J" in z:
        lin = fac.WindowState.zero(est.F)
        lin = lin._replace(**{k: jnp.asarray(z[f"prior_lin_{k}"])
                              for k in ("p", "q", "v", "ba", "bg", "rho",
                                        "tic", "qic")},
                           td=jnp.asarray(z["prior_lin_td"]))
        valid = jnp.asarray(z["prior_valid"]) if "prior_valid" in z \
            else jnp.asarray(True)
        est.prior = (z["prior_J"], z["prior_r"], lin, valid)
    else:
        est.prior = None
    for k in range(10):
        if f"buf{k}_t" in z:
            buf = IntervalBuffer()
            ts = z[f"buf{k}_t"]
            for i in range(len(ts)):
                buf.append(ts[i], z[f"buf{k}_acc"][i], z[f"buf{k}_gyr"][i],
                           z[f"buf{k}_phi"][i], z[f"buf{k}_dphi"][i],
                           z[f"buf{k}_c"][i])
            est.buffers[k] = buf
            est.preints[k] = est._run_preint(buf, est.ba[k], est.bg[k],
                                             est.rho[k])
        else:
            est.buffers[k] = None
            est.preints[k] = None
    if "prev_img_t" in z:
        est.prev_img_t = float(z["prev_img_t"])
    if "pending_rows" in z:
        rows = z["pending_rows"]
        if est.sync is not None:
            for r in rows:
                est.sync.push(r[0], r[1:4], r[4:7], r[7:19], r[19:31],
                              r[31:35])
        else:
            for r in rows:
                est.pending.append(r[0], r[1:4], r[4:7], r[7:19], r[19:31],
                                   r[31:35])
    return est
