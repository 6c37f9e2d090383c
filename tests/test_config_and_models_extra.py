"""Extra coverage: reference YAMLs end-to-end into model builds, ResNet-152,
COCO dataset fixture, config dump/roundtrip."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posetpu.config import default_config, gen_config, get_model_name, load_config


REF_YAML = "/root/reference/experiments/mixed/resnet50/256_nofusion_fund5.yaml"


@pytest.mark.skipif(not os.path.exists(REF_YAML), reason="reference not mounted")
def test_reference_yaml_builds_model_and_steps():
    """A real reference experiment YAML drives the model factory + train-step
    builder unchanged."""
    from posetpu.cli.common import build_model
    from posetpu.train.optim import make_optimizer
    from posetpu.train.step import make_train_step

    cfg = load_config(REF_YAML)
    assert cfg.LOSS.USE_FUNDAMENTAL_LOSS
    assert cfg.LOSS.FUNDAMENTAL_LOSS_WEIGHT == 5
    assert not cfg.NETWORK.AGGRE
    model = build_model(cfg, bf16=False)
    assert model.resnet.num_layers == 50
    tx = make_optimizer(cfg, steps_per_epoch=10)
    step = make_train_step(model, cfg, tx)
    assert callable(step)
    name, full = get_model_name(cfg)
    assert full == "256x256_multiview_pose_resnet_50_d256d256d256"


def test_resnet152_builds_and_runs(rng):
    from posetpu.models.pose_resnet import PoseResNet

    model = PoseResNet(num_layers=152)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    variables = jax.eval_shape(
        lambda k: model.init(k, x, train=False), jax.random.PRNGKey(0)
    )
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert 55e6 < n_params < 80e6  # resnet152 backbone + head


def test_all_experiment_presets_load():
    """Every committed preset parses through the strict loader, covering all
    hand-written reference config families (reference: experiments/**)."""
    import glob

    root = os.path.join(os.path.dirname(__file__), "..", "experiments")
    paths = sorted(glob.glob(os.path.join(root, "**", "*.yaml"), recursive=True))
    assert len(paths) >= 20, f"preset tree too thin: {len(paths)}"
    families = set()
    for p in paths:
        cfg = load_config(p)
        assert cfg.NETWORK.IMAGE_SIZE[0] >= 64
        families.add(os.path.relpath(p, root).split(os.sep)[0])
    assert {"mpii", "mixed", "multiview_h36m", "coco", "coco_mpii"} <= families


def test_config_dump_roundtrip(tmp_path):
    cfg = default_config()
    cfg.TRAIN.BATCH_SIZE = 13
    path = str(tmp_path / "dump.yaml")
    gen_config(cfg, path)
    cfg2 = load_config(path)
    assert cfg2.TRAIN.BATCH_SIZE == 13
    assert list(cfg2.NETWORK.IMAGE_SIZE) == list(cfg.NETWORK.IMAGE_SIZE)


@pytest.fixture
def coco_root(tmp_path):
    import cv2

    root = tmp_path / "data"
    os.makedirs(root / "coco" / "annotations", exist_ok=True)
    os.makedirs(root / "coco" / "images" / "train2017", exist_ok=True)
    images, anns = [], []
    for i in range(8):
        name = f"{i:012d}.jpg"
        cv2.imwrite(
            str(root / "coco" / "images" / "train2017" / name),
            np.random.RandomState(i).randint(0, 255, (100, 120, 3), np.uint8),
        )
        images.append({"id": i, "file_name": name, "width": 120, "height": 100})
        kp = np.zeros(17 * 3)
        kp[0::3] = np.random.RandomState(i).uniform(20, 100, 17)
        kp[1::3] = np.random.RandomState(i).uniform(20, 80, 17)
        kp[2::3] = 2
        anns.append(
            {
                "id": i, "image_id": i, "category_id": 1, "iscrowd": 0,
                "num_keypoints": 17, "keypoints": kp.tolist(),
                "bbox": [10.0, 10.0, 80.0, 70.0],
            }
        )
    with open(root / "coco" / "annotations" / "person_keypoints_train2017.json", "w") as f:
        json.dump({"images": images, "annotations": anns}, f)
    return root


def test_coco_dataset(coco_root):
    from posetpu.data.coco import COCODataset

    cfg = default_config()
    cfg.DATASET.ROOT = str(coco_root)
    cfg.NETWORK.IMAGE_SIZE = np.array([64, 64])
    cfg.NETWORK.HEATMAP_SIZE = np.array([16, 16])
    ds = COCODataset(cfg, "train", is_train=True)
    assert len(ds.db) == 8
    assert len(ds) == 2
    rec = ds.load_record(0, np.random.RandomState(0))
    assert rec["image"].shape == (64, 64, 3)
    # coco joints partially map: nose/eyes/ears have no union slot
    unmapped = [k for k, v in ds.u2a_mapping.items() if v == "*"]
    assert len(unmapped) == 4  # root, thorax, upper neck, head top


def test_mean_std_ratio_strings_parse_without_eval():
    """The reference's YAMLs write MEAN/STD entries as '123.675/255' strings
    (lib/core/config.py:237-256); the coercion must parse that arithmetic
    form — via a literal ratio parser, not eval()."""
    from posetpu.config import _parse_ratio

    assert _parse_ratio("123.675/255") == 123.675 / 255
    assert _parse_ratio("0.485") == 0.485
    assert _parse_ratio("1/2/2") == 0.25
    with pytest.raises(ValueError):
        _parse_ratio("__import__('os')")

    cfg = default_config()
    gen_config  # reference-parity surface exercised elsewhere
    np.testing.assert_allclose(
        cfg.DATASET.MEAN, [0.485, 0.456, 0.406], atol=1e-6)
