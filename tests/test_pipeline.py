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
