#!/usr/bin/env python
"""Throughput of the on-device KLT front-end, batched over camera streams.

The reference's front-end is single-threaded OpenCV — one KLT per process
(SURVEY.md §3 hot loop #4). Here the full pyramidal forward-backward LK for
N point slots runs as one jitted XLA program vmapped over B independent
streams; at pod scale the batch axis shards over the mesh.

Prints one JSON line: streams tracked per second (1 stereo-equivalent track
pass per stream per tick) and point-tracks/s.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cerberus_tpu.ops import klt

    H, W, N = 480, 640, 150            # reference: 640x480, max_cnt 120-250
    B = int(os.environ.get("KLT_BATCH", "16"))
    levels = 4  # match DeviceTracker default (OpenCV maxLevel=3)
    rng = np.random.default_rng(0)

    base = rng.uniform(0, 255, size=(B, H // 4, W // 4)).astype(np.float32)
    # smooth upsample for trackable texture
    img0 = jnp.asarray(np.repeat(np.repeat(base, 4, 1), 4, 2))
    img0 = jax.vmap(lambda im: klt._sep_blur(klt._sep_blur(im)))(img0)
    shift = 3.0
    img1 = jnp.roll(img0, int(shift), axis=2)

    pts = jnp.asarray(
        rng.uniform([30, 30], [W - 30, H - 30], size=(B, N, 2)), jnp.float32)
    valid = jnp.ones((B, N), bool)

    def one(i0, i1, p, v):
        p0 = klt.build_pyramid(i0, levels)
        p1 = klt.build_pyramid(i1, levels)
        res = klt.lk_track_fb(p0, p1, p, v)
        return jnp.sum(res.pts) + jnp.sum(res.status)

    fn = jax.jit(lambda *a: jnp.sum(jax.vmap(one)(*a)))
    float(fn(img0, img1, pts, valid))  # compile
    reps = 8
    ts = []
    for k in range(reps):
        p2 = pts + 0.001 * k
        t0 = time.time()
        float(fn(img0, img1, p2, valid))
        ts.append(time.time() - t0)
    dt = float(np.median(ts))

    print(json.dumps(dict(
        metric="klt_streams_per_s", value=round(B / dt, 2), unit="streams/s",
        point_tracks_per_s=round(B * N / dt, 0),
        batch=B, points=N, resolution=f"{W}x{H}", levels=levels,
        platform=jax.devices()[0].platform,
        batch_latency_ms=round(dt * 1000, 2),
        note="fb-checked pyramidal LK incl. pyramid build, per stereo-pair tick",
    )))


if __name__ == "__main__":
    main()
