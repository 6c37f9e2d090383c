"""Model-stack parity tests: layer ops vs torch functional oracles, and the
full converted ResNet-18 PoseResNet vs a dict-driven torch interpreter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from posetpu.models.convert_torch import convert_multiview, convert_pose_resnet, to_jax
from posetpu.models.multiview import Aggregation, MultiViewPose
from posetpu.models.pose_resnet import PoseResNet, torch_conv_transpose


def _t(x):
    return torch.from_numpy(np.asarray(x))


# ---------------------------------------------------------------- layer ops


@pytest.mark.parametrize("k,pad,opad", [(4, 1, 0), (3, 1, 1), (2, 0, 0)])
def test_conv_transpose_matches_torch(k, pad, opad, rng):
    x = rng.randn(2, 8, 5, 5).astype(np.float32)  # NCHW for torch
    w = rng.randn(8, 6, k, k).astype(np.float32)  # [in, out, kh, kw]
    ref = F.conv_transpose2d(_t(x), _t(w), None, stride=2, padding=pad,
                             output_padding=opad).numpy()
    kernel = jnp.asarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy())
    got = torch_conv_transpose(
        jnp.asarray(x.transpose(0, 2, 3, 1)), kernel, 2, pad, opad
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4
    )


# ------------------------------------------------- full network conversion


def _rand_bn(state, prefix, c, rng):
    state[f"{prefix}.weight"] = rng.randn(c).astype(np.float32)
    state[f"{prefix}.bias"] = rng.randn(c).astype(np.float32)
    state[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
    state[f"{prefix}.running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
    state[f"{prefix}.num_batches_tracked"] = np.array(1)


def _make_resnet18_state(rng, num_joints=16):
    """Random torch-layout state dict for a ResNet-18 PoseResNet."""
    st = {}
    st["conv1.weight"] = (rng.randn(64, 3, 7, 7) * 0.05).astype(np.float32)
    _rand_bn(st, "bn1", 64, rng)
    inp = 64
    for s, planes in enumerate((64, 128, 256, 512), start=1):
        for b in range(2):
            stride = 2 if (s > 1 and b == 0) else 1
            p = f"layer{s}.{b}"
            st[f"{p}.conv1.weight"] = (rng.randn(planes, inp, 3, 3) * 0.05).astype(np.float32)
            _rand_bn(st, f"{p}.bn1", planes, rng)
            st[f"{p}.conv2.weight"] = (rng.randn(planes, planes, 3, 3) * 0.05).astype(np.float32)
            _rand_bn(st, f"{p}.bn2", planes, rng)
            if b == 0 and (stride != 1 or inp != planes):
                st[f"{p}.downsample.0.weight"] = (rng.randn(planes, inp, 1, 1) * 0.05).astype(np.float32)
                _rand_bn(st, f"{p}.downsample.1", planes, rng)
            inp = planes
    c = 512
    for i in (0, 3, 6):
        st[f"deconv_layers.{i}.weight"] = (rng.randn(c, 256, 4, 4) * 0.05).astype(np.float32)
        _rand_bn(st, f"deconv_layers.{i+1}", 256, rng)
        c = 256
    st["final_layer.weight"] = (rng.randn(num_joints, 256, 1, 1) * 0.05).astype(np.float32)
    st["final_layer.bias"] = rng.randn(num_joints).astype(np.float32)
    return st


def _torch_interpret(st, x):
    """Run the PoseResNet graph with torch.nn.functional driven by the state
    dict (eval semantics). x: [N, 3, H, W] numpy."""
    def bn(h, p):
        return F.batch_norm(h, _t(st[f"{p}.running_mean"]), _t(st[f"{p}.running_var"]),
                            _t(st[f"{p}.weight"]), _t(st[f"{p}.bias"]), False, 0.1, 1e-5)

    def conv(h, p, stride=1, padding=0, bias=False):
        b = _t(st[f"{p}.bias"]) if bias else None
        return F.conv2d(h, _t(st[f"{p}.weight"]), b, stride, padding)

    h = _t(x)
    h = F.relu(bn(conv(h, "conv1", 2, 3), "bn1"))
    h = F.max_pool2d(h, 3, 2, 1)
    x1 = None
    for s in range(1, 5):
        for b in range(2):
            stride = 2 if (s > 1 and b == 0) else 1
            p = f"layer{s}.{b}"
            res = h
            out = F.relu(bn(conv(h, f"{p}.conv1", stride, 1), f"{p}.bn1"))
            out = bn(conv(out, f"{p}.conv2", 1, 1), f"{p}.bn2")
            if f"{p}.downsample.0.weight" in st:
                res = bn(conv(h, f"{p}.downsample.0", stride, 0), f"{p}.downsample.1")
            h = F.relu(out + res)
        if s == 1:
            x1 = h
    f = h
    for i in (0, 3, 6):
        f = F.conv_transpose2d(f, _t(st[f"deconv_layers.{i}.weight"]), None, 2, 1)
        f = F.relu(bn(f, f"deconv_layers.{i+1}"))
    hm = conv(f, "final_layer", 1, 0, bias=True)
    return hm.numpy(), x1.numpy(), f.numpy()


def test_converted_resnet18_matches_torch(rng):
    st = _make_resnet18_state(rng)
    variables, unused = convert_pose_resnet(st)
    assert unused == [], unused

    x = rng.randn(2, 3, 64, 64).astype(np.float32)
    exp_hm, exp_x1, exp_f = _torch_interpret(st, x)

    model = PoseResNet(num_layers=18)
    got_hm, got_x1, got_f = model.apply(
        to_jax(variables), jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
    )
    # tolerances absorb conv-accumulation-order noise on ~1e2 activations
    np.testing.assert_allclose(
        np.asarray(got_x1).transpose(0, 3, 1, 2), exp_x1, rtol=5e-3, atol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(got_f).transpose(0, 3, 1, 2), exp_f, rtol=5e-3, atol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(got_hm).transpose(0, 3, 1, 2), exp_hm, rtol=5e-3, atol=5e-2
    )


def test_multiview_convert_and_aggregation(rng):
    """Aggregation einsum == the reference's per-pair FC semantics."""
    s = 16  # 4x4 heatmaps
    st = {f"aggre_layer.aggre.{i}.weight": rng.randn(s, s).astype(np.float32)
          for i in range(12)}
    variables, unused = convert_multiview(st)
    assert unused == []
    bank = variables["params"]["aggre_layer"]["weight"]

    hm = rng.randn(2, 4, 4, 4, 3).astype(np.float32)  # [N, V, h, w, J]
    model = Aggregation(heatmap_size=4)
    out = model.apply({"params": {"weight": jnp.asarray(bank)}}, jnp.asarray(hm))

    # oracle: per target view, mean over source views of flat @ W[fc_idx]
    exp = np.zeros_like(hm)
    fc = 0
    for tgt in range(4):
        for src in [k for k in range(4) if k != tgt]:
            flat = hm[:, src].transpose(0, 3, 1, 2).reshape(2 * 3, s)  # [N*J, S]
            warped = (flat @ bank[fc]).reshape(2, 3, 4, 4).transpose(0, 2, 3, 1)
            exp[:, tgt] += warped / 3.0
            fc += 1
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-4, atol=1e-4)


def test_multiview_forward_shapes(rng):
    model = MultiViewPose(resnet=PoseResNet(num_layers=18), aggre=True)
    x = jnp.asarray(rng.randn(1, 4, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    raw, fused, low, high = model.apply(variables, x, train=False)
    assert raw.shape == (1, 4, 16, 16, 16)
    assert fused.shape == raw.shape
    assert low.shape == (1, 4, 16, 16, 64)
    assert high.shape == (1, 4, 16, 16, 256)


def test_pseudo_checkpoint_roundtrip(tmp_path, rng):
    """Save a torch-style checkpoint envelope and load through the converter."""
    st = _make_resnet18_state(rng)
    wrapped = {"state_dict_base_model": {f"module.resnet.{k}": _t(v) if not np.isscalar(v) else v
                                          for k, v in st.items()}}
    path = tmp_path / "checkpoint.pth.tar"
    torch.save(wrapped, path)

    from posetpu.models.convert_torch import load_torch_state

    state = load_torch_state(str(path))
    variables, unused = convert_multiview(state)
    assert unused == []
    assert "conv1" in variables["params"]["resnet"]
