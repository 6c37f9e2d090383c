"""Quantized serving example: float checkpoint -> int8 trunk + int8 fusion ->
decoded 2D + triangulated 3D, all in one jit.

    PYTHONPATH=. python examples/serve_int8.py
"""

import numpy as np
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

cfg = default_config()
cfg.NETWORK.IMAGE_SIZE = np.array([256, 256])
cfg.NETWORK.HEATMAP_SIZE = np.array([64, 64])

key = jax.random.PRNGKey(0)
model = get_pose_net(cfg, dtype=jnp.float32)
calib = jax.random.normal(key, (2, 256, 256, 3), jnp.float32)
variables = model.init(key, calib, train=False)  # or load a converted checkpoint
qparams, qfwd = quantize_pose_resnet(model, variables, [np.asarray(calib)])

aggre = Aggregation(heatmap_size=64)
aggre_vars = aggre.init(key, jnp.zeros((1, 4, 64, 64, 16)))
qagg = quantize_aggregation(aggre_vars["params"]["weight"])

B = 4
cams = tile_cameras(make_camera_ring(), B)
center = jnp.full((B, 4, 2), 500.0)
scale = jnp.full((B, 4, 2), 2.5)


@jax.jit
def serve(qparams, qagg, views):  # views: [B, 4, 256, 256, 3] normalized
    flat = views.reshape((B * 4,) + views.shape[2:])
    raw = qfwd(qparams, flat).reshape((B, 4, 64, 64, 16))
    fused = aggregation_int8_apply(qagg, raw)
    out = fuse_routing(raw, fused, jnp.ones((B,)))
    preds, maxvals = final_preds(out, center, scale)
    pts3d = triangulate_points(preds, cams, maxvals > 0.0)
    return preds, pts3d


views = jax.random.normal(key, (B, 4, 256, 256, 3), jnp.float32)
preds, pts3d = serve(qparams, qagg, views)
print("2D preds:", preds.shape, "3D poses:", pts3d.shape)
