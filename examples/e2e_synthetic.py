"""End-to-end drive: synthetic 4-cam rig -> GT 3D -> project -> render heatmaps
-> decode -> inverse-affine -> triangulate -> RANSAC, through `import posetpu`."""
import numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices())
from posetpu.data.synthetic import make_camera_ring, make_poses3d, tile_cameras
from posetpu.geometry import project_points, triangulate_points, ransac_filter
from posetpu.ops import (get_affine_transform, affine_transform_points,
                         render_gaussian_heatmaps, decode_heatmaps, transform_preds)

G, V, J = 8, 4, 16
cams = tile_cameras(make_camera_ring(), G)
gt3d = make_poses3d(G)
pix = jax.vmap(lambda c, x: jax.vmap(lambda cv: project_points(x, cv))(c))(cams, jnp.asarray(gt3d))

# crop each view's joints into a 256x256 frame, render 64x64 heatmaps, decode back
center = jnp.full((G, V, 2), 500.0)
scale = jnp.full((G, V, 2), 5.0)
trans = get_affine_transform(center, scale, 0.0, (256, 256))
jt = affine_transform_points(pix, trans)
hm, w = render_gaussian_heatmaps(jt, jnp.ones((G, V, J)), (64, 64), (256, 256), 2)
print("all joints on-map:", bool(w.min() > 0))
coords, maxv = decode_heatmaps(hm)
back = transform_preds(coords, center, scale, (64, 64))
px_err = float(jnp.abs(back - pix).max())
print(f"pixel roundtrip err through heatmap decode: {px_err:.2f} px (quantization-bounded)")

# triangulate decoded 2D back to 3D
rec = triangulate_points(back, cams)
mpjpe = float(jnp.linalg.norm(rec - gt3d, axis=-1).mean())
print(f"MPJPE from decoded heatmaps: {mpjpe:.1f} mm")
rec_gt = triangulate_points(pix, cams)
print(f"MPJPE from GT 2D: {float(jnp.linalg.norm(rec_gt - gt3d, axis=-1).mean()):.4f} mm")

# RANSAC: corrupt one observation, expect it dropped
bad = np.array(pix); bad[0, 1, 5] += 250.0
res = np.asarray(ransac_filter(jnp.asarray(bad), cams, jnp.ones((G, V, J)), 10.0, 3))
print("ransac drops corrupted view:", res[0, 1, 5] == 0.0, "| keeps clean:", res[1:].min() == 1.0)
