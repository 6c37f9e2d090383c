"""Per-stage timing of the int8 trunk (stem / layer1..4 / deconvs / head).

Times prefixes of the quantized layer plan and diffs them, so each row is the
marginal cost of one stage inside the real fused graph.
"""

from __future__ import annotations

import time

import numpy as np

LOOP = 20
BATCH = 32


def main():
    import jax
    import jax.numpy as jnp

    from posetpu.config import default_config
    from posetpu.models import get_pose_net
    from posetpu.models.quant import _Int8Runner, _forward, _plan, quantize_pose_resnet

    @jax.jit
    def nop(x):
        return x + 1.0

    float(nop(jnp.float32(0)))
    rtt = []
    for i in range(10):
        t0 = time.perf_counter()
        float(nop(jnp.float32(i)))
        rtt.append(time.perf_counter() - t0)
    rtt = min(rtt)
    print(f"tunnel rtt: {rtt*1e3:.1f} ms", flush=True)

    cfg = default_config()
    cfg.NETWORK.IMAGE_SIZE = np.array([256, 256])
    cfg.NETWORK.HEATMAP_SIZE = np.array([64, 64])
    model = get_pose_net(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    calib = jax.random.normal(key, (2, 256, 256, 3), jnp.float32)
    variables = model.init(key, calib, train=False)
    qparams, _ = quantize_pose_resnet(model, variables, [np.asarray(calib)])

    x = jax.random.normal(key, (BATCH * 4, 256, 256, 3), jnp.float32)

    plan = _plan(model.num_layers, model.deconv_filters, model.deconv_kernels)
    # prefix boundaries: after stem, after each layer stage, after deconvs, end
    names = []
    cuts = []
    last_stage = None
    for i, (kind, info) in enumerate(plan):
        if kind == "block":
            stage = info["name"].split("_")[0]
            if stage != last_stage:
                if last_stage is not None:
                    cuts.append(i)
                    names.append(last_stage)
                elif i > 0:
                    cuts.append(i)
                    names.append("stem")
                last_stage = stage
        elif kind == "deconv" and last_stage is not None:
            cuts.append(i)
            names.append(last_stage)
            last_stage = None
    cuts.append(len(plan) - 1)
    names.append("deconvs")
    cuts.append(len(plan))
    names.append("head")

    import functools

    def make_prefix(n_items):
        import flax.linen as nn

        def fwd(qp, xin):
            runner = _Int8Runner(qp)
            h_q, s_h = runner.input(xin)
            for kind, info in plan[:n_items]:
                if kind == "stem":
                    h_q, s_h = runner.qchain(h_q, s_h, "stem", stride=2)
                    h_q = nn.max_pool(
                        h_q, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
                    )
                elif kind == "block":
                    name = info["name"]
                    if info["kind"] == "bottleneck":
                        m, s_m = runner.qchain(h_q, s_h, f"{name}.conv1")
                        m, s_m = runner.qchain(
                            m, s_m, f"{name}.conv2", stride=info["stride"]
                        )
                        y = runner.conv_f32(m, s_m, f"{name}.conv3")
                    else:
                        m, s_m = runner.qchain(
                            h_q, s_h, f"{name}.conv1", stride=info["stride"]
                        )
                        y = runner.conv_f32(m, s_m, f"{name}.conv2")
                    if info["downsample"]:
                        r_q, r_s = runner.qchain(
                            h_q, s_h, f"{name}.downsample",
                            stride=info["stride"], relu=False,
                        )
                    else:
                        r_q, r_s = h_q, s_h
                    out = jax.nn.relu(y + runner.dequant(r_q, r_s))
                    h_q, s_h = runner.requant(out, f"{name}.out")
                elif kind == "deconv":
                    k = info["kernel"]
                    pad = k - 1 - (1 if k in (3, 4) else 0)
                    opad = 1 if k == 3 else 0
                    h_q, s_h = runner.qchain(
                        h_q, s_h, info["name"],
                        padding=[(pad, pad + opad), (pad, pad + opad)],
                        lhs_dilation=(2, 2),
                    )
                else:
                    h_q = runner.conv_f32(h_q, s_h, "final")
            return h_q

        @jax.jit
        def run(qp, xin):
            def body(i, acc):
                o = fwd(qp, xin + acc * 1e-30)
                return acc + o[0, 0, 0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

        return run

    def timeit(fn, reps=3):
        float(fn(qparams, x))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(qparams, x))
            ts.append(time.perf_counter() - t0)
        return (min(ts) - rtt) / LOOP * 1e3

    prev = 0.0
    prev_name = "input-quant"
    for cut, name in zip(cuts, names):
        ms = timeit(make_prefix(cut))
        print(f"up to {name:10s} {ms:7.2f} ms   (+{ms - prev:6.2f} for {prev_name})",
              flush=True)
        prev, prev_name = ms, name
    print(f"(last marginal = {names[-1]})")


if __name__ == "__main__":
    main()
