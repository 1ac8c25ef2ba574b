"""End-to-end training on the synthetic ball scene over the 8-device CPU
mesh: loss decreases, PSNR increases, checkpoint roundtrips."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from samnerf_tpu.data.datamanager import DataManager, DataManagerConfig
from samnerf_tpu.data.dataparser import DataparserConfig
from samnerf_tpu.engine.optimizers import OptimizerGroupConfig
from samnerf_tpu.engine.trainer import Trainer, TrainerConfig
from samnerf_tpu.models.sam_model import SAMModelConfig
from samnerf_tpu.utils import synthetic

TINY_MODEL = SAMModelConfig(
    num_levels=4, max_res=128, log2_hashmap_size=12,
    num_proposal_samples_per_ray=(12,), num_nerf_samples_per_ray=12,
    proposal_net_args=({"hidden_dim": 8, "log2_hashmap_size": 10,
                        "num_levels": 3, "max_res": 64},),
    hashgrid_layers=(2, 2), hashgrid_resolutions=((16, 32), (32, 64)),
    hashgrid_sizes=(9, 9), num_sam_samples=4, patch_size=2,
    distill_sam=True, use_clipseg_feature=True,
    far_plane=6.0)

GROUPS = {
    "proposal_networks": OptimizerGroupConfig(lr=1e-2, lr_final=5e-4, max_steps=200),
    "fields": OptimizerGroupConfig(lr=1e-2, lr_final=5e-4, max_steps=200),
    "sam_field": OptimizerGroupConfig(lr=5e-3, lr_final=1e-4, max_steps=200),
    "conv": OptimizerGroupConfig(lr=5e-3, lr_final=1e-4, max_steps=200),
}


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    scene = synthetic.write_scene(tmp_path_factory.mktemp("scene"),
                                  num_train=6, num_test=2, h=32, w=32,
                                  with_features=True, feature_long_side=8)
    dm = DataManager(DataManagerConfig(
        dataparser=DataparserConfig(data=scene, train_val_json_split=True),
        train_num_rays_per_batch=256, patch_size=2, distill_sam=True,
        use_clipseg_feature=True))
    out = tmp_path_factory.mktemp("out")
    return Trainer(TINY_MODEL,
                   TrainerConfig(max_num_iterations=60, steps_per_save=100000,
                                 log_every=20, output_dir=out),
                   GROUPS, dm)


def test_training_improves(trainer):
    assert len(jax.devices()) == 8  # the virtual CPU mesh is active
    m0 = trainer.train_iteration(0)
    psnr0 = float(m0["psnr"])
    trainer.train()
    m_last = trainer.metrics_history[-1][1]
    assert m_last["psnr"] > psnr0 + 2.0, (psnr0, m_last)
    assert m_last["total_loss"] < float(m0["total_loss"])
    assert np.isfinite(m_last["sam_loss"])


def test_final_checkpoint_saved(trainer):
    """train() ran to step 60 with steps_per_save=100000 — the final weights
    must still land on disk (round-1 advisor finding)."""
    ckpts = [p.name for p in trainer._ckpt_dir().glob("step-*")]
    assert "step-000000060" in ckpts


def test_eval_cadence_fires(trainer):
    """steps_per_eval_batch / steps_per_eval_image observably fire
    (reference Trainer.eval_iteration, trainer.py:442-477)."""
    import dataclasses
    from samnerf_tpu.utils import writer
    trainer.cfg = dataclasses.replace(trainer.cfg, steps_per_eval_batch=10,
                                      steps_per_eval_image=20)
    trainer.eval_iteration(10, n=1)      # crosses an eval-batch boundary
    names = [e["name"] for e in writer._EVENTS]
    assert "Eval Loss" in names
    assert "Eval Loss Dict" in names
    trainer.eval_iteration(20, n=5)      # fused block crossing image boundary
    names = [e["name"] for e in writer._EVENTS]
    assert writer.EventName.CURR_TEST_PSNR.value in names
    assert any(n.startswith("Eval Images/") for n in names)
    hist_metrics = trainer.metrics_history[-1][1]
    assert np.isfinite(hist_metrics["psnr"])
    writer.write_out_storage()           # leave the queue clean


def test_checkpoint_roundtrip(trainer):
    trainer.save_checkpoint(999)
    ckpts = sorted(trainer._ckpt_dir().glob("step-*"))
    assert len(ckpts) >= 1
    step_before = 999  # the ckpt stores the loop step it was saved at
    p_before = jax.device_get(trainer.state.params)
    trainer.state = trainer.state.replace(
        params=jax.tree.map(jnp.zeros_like, trainer.state.params))
    trainer.load_checkpoint(ckpts[-1])
    p_after = jax.device_get(trainer.state.params)
    for a, b in zip(jax.tree.leaves(p_before), jax.tree.leaves(p_after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(trainer.state.step) == step_before


def test_resume_from_load_dir(trainer, tmp_path):
    """load_dir restores the latest checkpoint and train() continues from
    its step (reference trainer.py:357-376)."""
    import dataclasses
    from samnerf_tpu.engine.trainer import Trainer, TrainerConfig
    tr = trainer
    tr.save_checkpoint(7)
    # save_only_latest pruning keeps the highest step present
    latest = sorted(tr._ckpt_dir().glob("step-*"))[-1]
    expect = int(latest.name.split("-")[1])
    cfg2 = dataclasses.replace(
        tr.cfg, load_dir=tr._ckpt_dir(),
        max_num_iterations=expect + 1)
    tr2 = Trainer(tr.model_cfg, cfg2, GROUPS, tr.datamanager)
    assert int(tr2.state.step) == expect


def test_vis_setup_writers_and_finalize(tmp_path, monkeypatch):
    """--vis wiring: json writer registered from the config, rows flushed
    by writer.finalize at end of training (train.py _setup_vis)."""
    import samnerf_tpu.train as train_mod
    from samnerf_tpu.configs.methods import method_configs
    from samnerf_tpu.utils import writer

    monkeypatch.setattr(writer, "_WRITERS", [])
    config = method_configs()["samnerf_distill"]
    config.vis = "json"
    config.trainer.output_dir = tmp_path

    class FakeTrainer:
        pass

    cb = train_mod._setup_vis(config, FakeTrainer())
    assert cb is None                       # no viewer requested
    assert len(writer._WRITERS) == 1
    writer.put_scalar("x", 1.5, 0)
    writer.write_out_storage()
    writer.finalize()
    import json
    rows = json.loads((tmp_path / "metrics.json").read_text())
    assert rows == [{"name": "x", "value": 1.5, "step": 0}]

    # viewer failure degrades to headless (no exception escapes)
    monkeypatch.setattr(train_mod, "_launch_viewer",
                        lambda t, c: (_ for _ in ()).throw(OSError("no port")))
    config.vis = "viewer"
    assert train_mod._setup_vis(config, FakeTrainer()) is None
