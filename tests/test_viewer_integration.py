"""End-to-end viewer integration: websocket client sends a CameraMessage,
receives a rendered BackgroundImageMessage; SAM pins flow through the
3D-locking path with a tiny distill model + random-weight SAM decoder."""
import base64
import io
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samnerf_tpu.core.rays import RayBundle
from samnerf_tpu.engine.render_pipeline import SamNerfRenderer
from samnerf_tpu.models.sam_model import SAMModel, SAMModelConfig
from samnerf_tpu.perception.sam.build_sam import build_sam
from samnerf_tpu.perception.sam.predictor import SamPredictor
from samnerf_tpu.viewer import messages as m
from samnerf_tpu.viewer.viewer_state import ViewerState

TINY = SAMModelConfig(
    num_levels=2, max_res=32, log2_hashmap_size=8,
    num_proposal_samples_per_ray=(8,), num_nerf_samples_per_ray=8,
    proposal_net_args=({"hidden_dim": 8, "log2_hashmap_size": 8,
                        "num_levels": 2, "max_res": 32},),
    hashgrid_layers=(2, 2), hashgrid_resolutions=((16, 32), (32, 64)),
    hashgrid_sizes=(8, 8), num_sam_samples=4, patch_size=2,
    distill_sam=True, use_clipseg_feature=False, far_plane=6.0)


@pytest.mark.slow
def test_viewer_end_to_end():
    import websockets.sync.client as wsc

    model = SAMModel(TINY)
    rng = np.random.RandomState(0)
    d = rng.randn(16, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rb = RayBundle(origins=jnp.zeros((16, 3)),
                   directions=jnp.asarray(d.astype(np.float32)),
                   pixel_area=jnp.ones((16, 1)) * 1e-6,
                   camera_indices=jnp.zeros((16, 1), jnp.int32))
    params = jax.jit(lambda r, b: model.init(
        r, b, rng=r, train=True, get_features=("sam",)))(
            jax.random.PRNGKey(0), rb)

    sam, _ = build_sam("vit_b")  # random weights: decode path only
    dummy = jnp.zeros((1, 64, 64, 3))
    sam_params = jax.jit(lambda r: sam.init(
        r, jnp.zeros((1, 16, 16, 3)), points=(jnp.zeros((1, 1, 2)),
                                              jnp.zeros((1, 1), jnp.int32))))(
        jax.random.PRNGKey(1))
    predictor = SamPredictor(sam, sam_params)

    renderer = SamNerfRenderer(model, sam_predictor=predictor, chunk=256)
    state = ViewerState(renderer, params_fn=lambda: params, cameras=None,
                        host="127.0.0.1", port=17121, max_res=64)
    state.start()
    state.init_scene()

    cam_msg = m.CameraMessage(
        aspect=1.0, render_aspect=1.0, fov=60.0,
        matrix=tuple(np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 2.0],
                               [0, 0, 0, 1.0]]).T.flatten().tolist()),
        camera_type="perspective", is_moving=False, timestamp=0,
        xs=[], ys=[])

    with wsc.connect("ws://127.0.0.1:17121", max_size=None) as ws:
        ws.send(cam_msg.serialize())
        # collect until a BackgroundImageMessage arrives
        img_msg = None
        deadline = time.time() + 180
        while time.time() < deadline:
            try:
                msg = m.Message.deserialize(ws.recv(timeout=5))
            except TimeoutError:
                continue
            if isinstance(msg, m.BackgroundImageMessage):
                img_msg = msg
                break
        assert img_msg is not None, "no rendered frame received"
        from PIL import Image
        img = Image.open(io.BytesIO(base64.b64decode(img_msg.base64_data)))
        assert img.width >= 30 and img.height >= 30

        # click a SAM pin -> rerender path with prompt locking + SAM decode
        state.use_sam = True
        pin_msg = m.CameraMessage(**{**cam_msg.__dict__,
                                     "xs": [0.5], "ys": [0.5]})
        ws.send(pin_msg.serialize())
        got_second = False
        deadline = time.time() + 240
        while time.time() < deadline:
            try:
                msg = m.Message.deserialize(ws.recv(timeout=5))
            except TimeoutError:
                continue
            if isinstance(msg, m.BackgroundImageMessage):
                got_second = True
                break
        assert got_second, "no frame after SAM pin"
        assert renderer.prompts is not None and len(renderer.prompts) == 1

    state.render_machine.stop()
