"""Depth/semantic/variable-res datamanagers + polycam/record3d converters."""
import json
from pathlib import Path

import numpy as np
import pytest

from samnerf_tpu.data.datamanager import DataManagerConfig
from samnerf_tpu.data.dataparser import DataparserConfig
from samnerf_tpu.utils import synthetic


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    return synthetic.write_scene(d, num_train=3, num_test=1, h=16, w=16)


def _cfg(scene):
    return DataManagerConfig(
        dataparser=DataparserConfig(data=scene, train_val_json_split=True),
        train_num_rays_per_batch=64, patch_size=1, distill_sam=False)


def test_depth_datamanager(scene):
    from PIL import Image
    from samnerf_tpu.data.datamanagers_extra import DepthDataManager
    ddir = Path(scene) / "depths"
    ddir.mkdir(exist_ok=True)
    dm0 = DepthDataManager(_cfg(scene))
    assert dm0.depths is None  # no depth files yet
    for p in dm0.train_outputs.image_filenames:
        np.save(ddir / (Path(p).stem + ".npy"),
                np.full((16, 16), 2.0, np.float32))
    dm = DepthDataManager(_cfg(scene))
    batch = dm.next_train(0)
    assert batch["depth_image"].shape == (64, 1)
    np.testing.assert_allclose(batch["depth_image"], 2.0)


def test_semantic_datamanager(scene):
    from PIL import Image
    from samnerf_tpu.data.datamanagers_extra import SemanticDataManager
    sdir = Path(scene) / "semantics"
    sdir.mkdir(exist_ok=True)
    dm0 = SemanticDataManager(_cfg(scene))
    for p in dm0.train_outputs.image_filenames:
        Image.fromarray(np.full((16, 16), 3, np.uint8)).save(
            sdir / (Path(p).stem + ".png"))
    dm = SemanticDataManager(_cfg(scene))
    batch = dm.next_train(0)
    assert batch["semantics"].shape == (64, 1)
    assert (batch["semantics"] == 3).all()


def test_variable_res_datamanager(scene):
    from samnerf_tpu.data.datamanagers_extra import VariableResDataManager
    dm = VariableResDataManager(_cfg(scene))
    batch = dm.next_train(0)
    assert batch["image"].shape == (64, 3)
    assert (batch["indices"][:, 0] == batch["indices"][0, 0]).all()


def test_polycam_converter(tmp_path):
    from samnerf_tpu.preprocessing.converters import polycam_to_json
    cams = tmp_path / "keyframes" / "cameras"
    cams.mkdir(parents=True)
    for i in range(3):
        data = {"fx": 500.0, "fy": 500.0, "cx": 320.0, "cy": 240.0,
                "width": 640, "height": 480, "blur_score": 100.0}
        m = np.eye(4)
        for r in range(3):
            for c in range(4):
                data[f"t_{r}{c}"] = float(m[r, c])
        (cams / f"frame_{i}.json").write_text(json.dumps(data))
    n = polycam_to_json(tmp_path / "keyframes", tmp_path / "out")
    assert n == 3
    meta = json.loads((tmp_path / "out" / "transforms.json").read_text())
    assert len(meta["frames"]) == 3
    assert meta["frames"][0]["fl_x"] == 500.0


def test_record3d_converter(tmp_path):
    from samnerf_tpu.preprocessing.converters import record3d_to_json
    k = np.array([[400.0, 0, 0], [0, 400.0, 0], [320.0, 240.0, 1]])
    meta = {"K": k.reshape(-1).tolist(), "w": 640, "h": 480,
            "poses": [[0, 0, 0, 1, 0, 0, float(i)] for i in range(2)]}
    (tmp_path / "metadata.json").write_text(json.dumps(meta))
    n = record3d_to_json(tmp_path / "metadata.json", tmp_path / "out")
    assert n == 2
    out = json.loads((tmp_path / "out" / "transforms.json").read_text())
    assert out["fl_x"] == 400.0
    m = np.array(out["frames"][1]["transform_matrix"])
    np.testing.assert_allclose(m[:3, :3], np.eye(3), atol=1e-9)
    np.testing.assert_allclose(m[2, 3], 1.0)
