"""Real-log ingestion: documented on-disk dataset schema + converters.

The reference consumes rosbags via roslaunch replay (reference:
launch/dataset/run_street_bag_vilo.launch, topics README.md:114-128); the
bags themselves are not vendored (bags/put_rosbags_here.txt). This module
defines the framework's bag-independent dataset layout, an offline
converter API, and a loader producing the same dict `simulate()` emits, so
`replay()` / `replay_images()` run identically on logged data.

## Dataset directory schema (version 1)

    dataset/
      meta.json            {"version": 1, "robot": "a1"|"go1",
                            "imu_rate": 500.0, "cam_rate": 15.0,
                            "contact_kind": "flag"|"force"}
      imu_leg.csv          500 Hz fused proprioceptive stream, one row per
                           sample, 35 columns:
                             t, acc[3], gyr[3], phi[12], dphi[12], contact[4]
                           (joint order FL,FR,RL,RR x hip,thigh,calf —
                            reference main.cpp:262-278; contact columns hold
                            flags or raw foot forces per contact_kind)
      mocap.csv            optional ground truth: t, px, py, pz[, qw,qx,qy,qz]
                           (reference: /mocap_node topic, main.cpp:401-425)
      cam.csv              image index: t, path0, path1  (paths relative to
                           the dataset dir; path1 empty for mono)
      cam0/ cam1/          grayscale images referenced by cam.csv
      features.npz         optional precomputed tracks (offline front-end
                           output) with arrays: t (Nf,), ids (Nf, K) int64
                           -1-padded, pts (Nf, K, 3), vel (Nf, K, 2),
                           pts_r / vel_r (right cam; z<=0 marks no stereo)

Either cam.csv+images or features.npz must be present for vision.

The CSV columns of imu_leg.csv are EXACTLY the native SensorSync row layout
(native/sensor_sync.cpp kSampleDoubles) so converted logs stream through the
ring buffer without reshaping.
"""

from __future__ import annotations

import csv
import json
import os

import numpy as np

SCHEMA_VERSION = 1
IMU_LEG_COLS = 35


def write_dataset(out_dir: str, t, acc, gyr, phi, dphi, contact,
                  cam_t=None, image_paths=None, mocap=None,
                  robot: str = "a1", imu_rate: float = 500.0,
                  cam_rate: float = 15.0, contact_kind: str = "flag"):
    """Write a schema-v1 dataset directory from packed arrays.

    This is the back half of any bag converter: decode your log with
    whatever reader you have (rosbags, a ROS environment, vendor SDK),
    then hand the arrays here.
    """
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(dict(version=SCHEMA_VERSION, robot=robot,
                       imu_rate=imu_rate, cam_rate=cam_rate,
                       contact_kind=contact_kind), f)
    rows = np.column_stack([np.asarray(t)[:, None], acc, gyr, phi, dphi,
                            contact])
    assert rows.shape[1] == IMU_LEG_COLS, rows.shape
    np.savetxt(os.path.join(out_dir, "imu_leg.csv"), rows, delimiter=",",
               fmt="%.9g")
    if mocap is not None:
        np.savetxt(os.path.join(out_dir, "mocap.csv"), mocap, delimiter=",",
                   fmt="%.9g")
    if cam_t is not None:
        with open(os.path.join(out_dir, "cam.csv"), "w", newline="") as f:
            w = csv.writer(f)
            for i, tc in enumerate(cam_t):
                p0, p1 = image_paths[i] if image_paths else ("", "")
                w.writerow([f"{tc:.9f}", p0, p1])


def load_dataset(path: str) -> dict:
    """Load a schema-v1 dataset into the replay dict format (same keys as
    data.simulator.simulate where applicable; images lazy-loaded)."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("version") != SCHEMA_VERSION:
        raise ValueError(f"unsupported dataset version {meta.get('version')}")
    rows = np.loadtxt(os.path.join(path, "imu_leg.csv"), delimiter=",",
                      ndmin=2)
    if rows.shape[1] != IMU_LEG_COLS:
        raise ValueError(f"imu_leg.csv must have {IMU_LEG_COLS} columns, "
                         f"got {rows.shape[1]}")
    out = dict(
        t=rows[:, 0], acc=rows[:, 1:4], gyr=rows[:, 4:7],
        phi=rows[:, 7:19], dphi=rows[:, 19:31],
        contacts=rows[:, 31:35], foot_forces=rows[:, 31:35],
        meta=meta,
    )
    mocap_p = os.path.join(path, "mocap.csv")
    if os.path.exists(mocap_p):
        m = np.loadtxt(mocap_p, delimiter=",", ndmin=2)
        out["mocap_t"] = m[:, 0]
        out["mocap_p"] = m[:, 1:4]
        if m.shape[1] >= 8:
            out["mocap_q"] = m[:, 4:8]
        # ground truth resampled onto the sensor clock for scoring
        out["p"] = np.column_stack([
            np.interp(out["t"], m[:, 0], m[:, 1 + i]) for i in range(3)])
    cam_p = os.path.join(path, "cam.csv")
    if os.path.exists(cam_p):
        cam_t, paths = [], []
        with open(cam_p, newline="") as f:
            for row in csv.reader(f):
                if not row:
                    continue
                cam_t.append(float(row[0]))
                paths.append((row[1], row[2] if len(row) > 2 else ""))
        out["cam_t"] = np.asarray(cam_t)
        out["image_paths"] = [
            tuple(os.path.join(path, p) if p else "" for p in pp)
            for pp in paths]
        # nearest sensor-sample index per image (replay keys on cam_idx)
        out["cam_idx"] = np.searchsorted(out["t"], out["cam_t"])
        out["cam_idx"] = np.clip(out["cam_idx"], 0, len(out["t"]) - 1)
    feat_p = os.path.join(path, "features.npz")
    if os.path.exists(feat_p):
        z = np.load(feat_p)
        frames = []
        for fi in range(len(z["t"])):
            frame = {}
            for k in range(z["ids"].shape[1]):
                fid = int(z["ids"][fi, k])
                if fid < 0:
                    continue
                pt_r = z["pts_r"][fi, k]
                frame[fid] = (z["pts"][fi, k], z["vel"][fi, k],
                              pt_r if pt_r[2] > 0 else None,
                              z["vel_r"][fi, k])
            frames.append(frame)
        out["features"] = frames
        if "cam_t" not in out:
            out["cam_t"] = z["t"]
            out["cam_idx"] = np.clip(
                np.searchsorted(out["t"], z["t"]), 0, len(out["t"]) - 1)
    return out


class ImageLoader:
    """Renderer-shaped adapter over on-disk images: replay_images() accepts
    it in place of ImageRenderer (duck-typed: render_stereo + f/cx/cy/W/H)."""

    def __init__(self, ds: dict, focal: float, cx: float, cy: float):
        try:
            import cv2
        except Exception as e:  # pragma: no cover
            raise RuntimeError("image datasets require OpenCV") from e
        self._cv2 = cv2
        self.ds = ds
        self.f, self.cx, self.cy = focal, cx, cy
        first = ds["image_paths"][0][0]
        im = cv2.imread(first, cv2.IMREAD_GRAYSCALE)
        if im is None:
            raise FileNotFoundError(first)
        self.H, self.W = im.shape
        self._by_idx = {int(k): i for i, k in enumerate(ds["cam_idx"])}

    def render_stereo(self, k: int):
        i = self._by_idx[int(k)]
        p0, p1 = self.ds["image_paths"][i]
        im0 = self._cv2.imread(p0, self._cv2.IMREAD_GRAYSCALE)
        im1 = self._cv2.imread(p1, self._cv2.IMREAD_GRAYSCALE) if p1 else None
        return im0, im1


def convert_rosbag(bag_path: str, out_dir: str, topics: dict | None = None):
    """Offline bag -> dataset-dir converter.

    Requires the pure-python `rosbags` package (not vendored in this image);
    in a ROS environment, export the topics to the schema above instead.
    Topic map defaults to the reference's A1 hardware topics
    (reference: config/a1_config/hardware_a1_vilo_config.yaml:10-17,
    main.cpp:454-470)."""
    try:
        from rosbags.highlevel import AnyReader  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "convert_rosbag needs the 'rosbags' package. Offline, decode the "
            "bag with any reader and call write_dataset() with the arrays; "
            "the schema is documented in this module's docstring.") from e
    raise NotImplementedError(
        "wire AnyReader message iteration to write_dataset() for your bag's "
        "exact message types")
