"""Per-stage timing of the int8 serving pipeline on the real chip.

Each stage is wrapped in its own fori_loop-inside-jit (LOOP steps per host
fetch) so tunnel RTT carries 1/LOOP weight; stage inputs are precomputed
device arrays so a stage's time excludes its producers. Prints a ms table.
"""

from __future__ import annotations

import time

import numpy as np

LOOP = 20
BATCH = 32


def timeit(fn, *args, reps=4, rtt=0.0):
    import jax

    float(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return (min(times) - rtt) / LOOP * 1e3  # ms per step


def looped(one):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*args):
        def body(i, acc):
            return acc + one(*args, jitter=acc * 1e-30)

        return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

    return run


def main():
    import jax
    import jax.numpy as jnp

    from posetpu.config import default_config
    from posetpu.core.inference import final_preds, fuse_routing
    from posetpu.data.synthetic import make_camera_ring, tile_cameras
    from posetpu.geometry.triangulate import triangulate_points
    from posetpu.models import get_pose_net
    from posetpu.models.multiview import Aggregation
    from posetpu.models.quant import (
        aggregation_int8_apply,
        quantize_aggregation,
        quantize_pose_resnet,
    )

    @jax.jit
    def nop(x):
        return x + 1.0

    float(nop(jnp.float32(0)))
    rtt = min(
        (lambda t0: (float(nop(jnp.float32(i))), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for i in range(10)
    )
    print(f"tunnel rtt: {rtt*1e3:.1f} ms")

    cfg = default_config()
    cfg.NETWORK.IMAGE_SIZE = np.array([256, 256])
    cfg.NETWORK.HEATMAP_SIZE = np.array([64, 64])
    model = get_pose_net(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    calib = jax.random.normal(key, (2, 256, 256, 3), jnp.float32)
    variables = model.init(key, calib, train=False)
    qparams, qfwd = quantize_pose_resnet(model, variables, [np.asarray(calib)])

    aggre = Aggregation(heatmap_size=64, dtype=jnp.bfloat16)
    aggre_vars = aggre.init(key, jnp.zeros((1, 4, 64, 64, 16)))
    qagg = quantize_aggregation(aggre_vars["params"]["weight"])

    x = jax.random.normal(key, (BATCH, 4, 256, 256, 3), jnp.float32)
    flat = x.reshape((BATCH * 4,) + x.shape[2:])
    cams = tile_cameras(make_camera_ring(), BATCH)
    center = jnp.full((BATCH, 4, 2), 500.0, jnp.float32)
    scale = jnp.full((BATCH, 4, 2), 2.5, jnp.float32)
    is_h36m = jnp.ones((BATCH,), jnp.float32)

    # --- stage inputs (precomputed on device)
    hm = qfwd(qparams, flat)
    raw = hm.reshape((BATCH, 4) + hm.shape[1:])
    fused = aggregation_int8_apply(qagg, raw)
    out = fuse_routing(raw, fused, is_h36m)
    preds, maxvals = final_preds(out, center, scale)
    for a in (hm, raw, fused, out, preds, maxvals):
        a.block_until_ready()

    # --- stages
    def s_trunk(qp, xin, jitter):
        return jnp.sum(qfwd(qp, xin + jitter)[:, 0, 0, 0])

    def s_agg(qa, r, jitter):
        return jnp.sum(aggregation_int8_apply(qa, r + jitter)[:, 0, 0, 0, 0])

    def s_route(r, f, jitter):
        return jnp.sum(fuse_routing(r + jitter, f, is_h36m)[:, 0, 0, 0, 0])

    def s_decode(o, jitter):
        p, mv = final_preds(o + jitter, center, scale)
        return jnp.sum(p) + jnp.sum(mv)

    def s_tri(p, mv, jitter):
        return jnp.sum(triangulate_points(p + jitter, cams, mv > 0.0))

    rows = [
        ("trunk int8 (qfwd)", looped(s_trunk), (qparams, flat)),
        ("aggregation int8", looped(s_agg), (qagg, raw)),
        ("fuse routing", looped(s_route), (raw, fused)),
        ("decode+affine", looped(s_decode), (out,)),
        ("triangulate", looped(s_tri), (preds, maxvals)),
    ]
    total = 0.0
    for name, fn, args in rows:
        ms = timeit(fn, *args, rtt=rtt)
        total += ms
        print(f"{name:24s} {ms:7.2f} ms")
    print(f"{'TOTAL (sum)':24s} {total:7.2f} ms  -> {BATCH/ (total/1e3):.0f} f/s")


if __name__ == "__main__":
    main()
