"""Quantized serving example through the public API: float checkpoint ->
posetpu.serving.build_serving_pipeline (int8 trunk, fused phase tail,
grouped int8 aggregation fusion, packed uint8 input) -> decoded 2D +
triangulated 3D.

    PYTHONPATH=. python examples/serve_int8.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from posetpu.config import default_config
from posetpu.data.synthetic import make_camera_ring, tile_cameras
from posetpu.geometry.triangulate import triangulate_points
from posetpu.models import get_pose_net
from posetpu.models.multiview import Aggregation
from posetpu.serving import build_serving_pipeline

cfg = default_config()
cfg.NETWORK.IMAGE_SIZE = np.array([256, 256])
cfg.NETWORK.HEATMAP_SIZE = np.array([64, 64])
cfg.NETWORK.AGGRE = True

key = jax.random.PRNGKey(0)
model = get_pose_net(cfg, dtype=jnp.float32)
calib = jax.random.normal(key, (2, 256, 256, 3), jnp.float32)
rv = model.init(key, calib, train=False)  # or load a converted checkpoint
aggre_vars = Aggregation(heatmap_size=64).init(
    key, jnp.zeros((1, 4, 64, 64, 16)))
variables = {
    "params": {"resnet": rv["params"],
               "aggre_layer": {"weight": aggre_vars["params"]["weight"]}},
    "batch_stats": {"resnet": rv["batch_stats"]},
}

# one call: PTQ calibration + the bench-proven serving configuration
pipe = build_serving_pipeline(cfg, variables, [np.asarray(calib)])

B = 4
cams = tile_cameras(make_camera_ring(), B)
center = jnp.full((B, 4, 2), 500.0)
scale = jnp.full((B, 4, 2), 2.5)

# serving input: raw uint8 camera crops, host-packed into the (H, W, C, N)
# space-to-depth contract (the native loader writes this layout for free:
# native.load_warp_batch_geom(s2d=True, hwcn=True))
frames = np.random.default_rng(0).integers(
    0, 256, (B, 4, 256, 256, 3), dtype=np.uint8)
x = jnp.asarray(pipe.prepare(frames))

preds, maxvals = pipe.infer(pipe.params, x, center, scale, jnp.ones((B,)))
pts3d = triangulate_points(preds, cams, maxvals > 0.0)
print("2D preds:", preds.shape, "3D poses:", pts3d.shape)
