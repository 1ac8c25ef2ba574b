"""VanillaPipeline API parity."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samnerf_tpu.data.datamanager import DataManager, DataManagerConfig
from samnerf_tpu.data.dataparser import DataparserConfig
from samnerf_tpu.engine.pipeline import VanillaPipeline
from samnerf_tpu.models.sam_model import SAMModel, SAMModelConfig
from samnerf_tpu.utils import synthetic

TINY = SAMModelConfig(
    num_levels=4, max_res=64, log2_hashmap_size=10,
    num_proposal_samples_per_ray=(8,), num_nerf_samples_per_ray=8,
    proposal_net_args=({"hidden_dim": 8, "log2_hashmap_size": 10,
                        "num_levels": 2, "max_res": 32},),
    distill_sam=False, far_plane=6.0)


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    scene = synthetic.write_scene(tmp_path_factory.mktemp("s"), num_train=3,
                                  num_test=1, h=16, w=16)
    dm = DataManager(DataManagerConfig(
        dataparser=DataparserConfig(data=scene, train_val_json_split=True),
        train_num_rays_per_batch=64, patch_size=1, distill_sam=False))
    model = SAMModel(TINY)
    batch = dm.next_train(0)
    from samnerf_tpu.core.cameras import generate_rays
    cams = jax.tree.map(jnp.asarray, dm.cameras)
    bundle = generate_rays(cams, jnp.asarray(batch["indices"][:, 0]),
                           jnp.asarray(batch["indices"][:, 1:], jnp.float32))
    params = model.init(jax.random.PRNGKey(0), bundle, train=True)
    return VanillaPipeline(model, TINY, dm), params


def test_train_loss_dict(pipeline):
    pipe, params = pipeline
    losses = pipe.get_train_loss_dict(params, step=0)
    assert "rgb_loss" in losses
    assert np.isfinite(float(sum(jax.tree.leaves(losses))))


def test_eval_image_metrics(pipeline):
    pipe, params = pipeline
    metrics, images = pipe.get_eval_image_metrics_and_images(params, 0)
    assert set(metrics) >= {"psnr", "ssim", "num_rays"}
    assert np.isfinite(metrics["psnr"])
    assert images["img"].shape == (16, 32, 3)  # gt | pred side by side


def test_param_groups(pipeline):
    pipe, params = pipeline
    groups = pipe.get_param_groups(params)
    assert "fields" in groups and "proposal_networks" in groups


def test_restore_json_overlays_saved_config():
    """eval_setup's config restore: saved values overlay the preset;
    default dict keys absent from the file are kept; non-JSON leaves
    keep defaults (utils/eval_utils._restore_json)."""
    import dataclasses
    from pathlib import Path

    from samnerf_tpu.utils.eval_utils import _restore_json

    @dataclasses.dataclass
    class Inner:
        lr: float = 1e-2

    @dataclasses.dataclass
    class Cfg:
        steps: int = 10
        data: Path = Path("/a")
        dims: tuple = (1, 2)
        groups: dict = dataclasses.field(
            default_factory=lambda: {"a": Inner(), "b": Inner()})
        dtype: type = float            # non-JSON leaf

    raw = {"steps": 99, "data": "/b", "dims": [3, 4],
           "groups": {"a": {"lr": 0.5}}, "dtype": "<class 'float'>"}
    out = _restore_json(Cfg(), raw)
    assert out.steps == 99 and out.data == Path("/b")
    assert out.dims == (3, 4)
    assert out.groups["a"].lr == 0.5
    assert isinstance(out.groups["b"], Inner)      # default key kept
    assert out.dtype is float                      # non-JSON leaf kept
