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
def test_viewer_end_to_end(request):
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
    request.addfinalizer(state.render_machine.stop)
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


@pytest.mark.slow
def test_viewer_full_client_session(tmp_path, request):
    """Scripted full client session over a real websocket — the in-env
    substitute for a browser drive (no browser/JS runtime exists in this
    environment): init_scene with camera frusta + dataset thumbnails,
    rendered frame, search-text prompt, crop, threshold/FPS, camera-path
    save + list round-trip, pin clear."""
    import websockets.sync.client as wsc

    from samnerf_tpu.core.cameras import Cameras

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

    sam, _ = build_sam("vit_b")
    sam_params = jax.jit(lambda r: sam.init(
        r, jnp.zeros((1, 16, 16, 3)), points=(jnp.zeros((1, 1, 2)),
                                              jnp.zeros((1, 1), jnp.int32))))(
        jax.random.PRNGKey(1))
    predictor = SamPredictor(sam, sam_params)
    renderer = SamNerfRenderer(model, sam_predictor=predictor, chunk=256)

    n_cams = 4
    c2ws = np.tile(np.eye(4)[:3, :4], (n_cams, 1, 1)).astype(np.float32)
    c2ws[:, 2, 3] = 2.0 + np.arange(n_cams)
    cams = Cameras(camera_to_worlds=jnp.asarray(c2ws),
                   fx=jnp.full((n_cams, 1), 40.0),
                   fy=jnp.full((n_cams, 1), 40.0),
                   cx=jnp.full((n_cams, 1), 32.0),
                   cy=jnp.full((n_cams, 1), 32.0), width=64, height=64)
    imgs = (np.random.RandomState(1).rand(n_cams, 32, 32, 3)
            * 255).astype(np.uint8)

    state = ViewerState(renderer, params_fn=lambda: params, cameras=cams,
                        host="127.0.0.1", port=17122, max_res=64)
    state.camera_paths_dir = str(tmp_path / "camera_paths")
    state.start()
    request.addfinalizer(state.render_machine.stop)

    cam_msg = m.CameraMessage(
        aspect=1.0, render_aspect=1.0, fov=60.0,
        matrix=tuple(np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 2.0],
                               [0, 0, 0, 1.0]]).T.flatten().tolist()),
        camera_type="perspective", is_moving=False, timestamp=0,
        xs=[], ys=[])

    with wsc.connect("ws://127.0.0.1:17122", max_size=None) as ws:
        # server declares its GUI + scene on connect-ish: init after
        state.init_scene(cameras=cams, images=imgs)
        ws.send(cam_msg.serialize())

        got = {"dataset_images": 0, "scene_box": False, "frame": False,
               "paths": None}
        deadline = time.time() + 180
        while time.time() < deadline:
            try:
                msg = m.Message.deserialize(ws.recv(timeout=5))
            except TimeoutError:
                continue
            if isinstance(msg, m.DatasetImageMessage):
                got["dataset_images"] += 1
                # thumbnail payload is a data-url the client can draw
                assert msg.json["image"].startswith("data:image/jpeg")
                c2w = np.asarray(msg.json["camera_to_world"])
                assert c2w.shape == (3, 4)
            elif isinstance(msg, m.SceneBoxMessage):
                got["scene_box"] = True
            elif isinstance(msg, m.BackgroundImageMessage):
                got["frame"] = True
                break
        assert got["frame"], "no rendered frame"
        assert got["scene_box"], "no scene box"
        assert got["dataset_images"] == n_cams, got["dataset_images"]

        # search text -> clipseg heatmap request path
        ws.send(m.SearchTextMessage(text="chair",
                                    switch_to_heat_map=True).serialize())
        # crop + thresholds + fps hints
        ws.send(m.CropParamsMessage(crop_enabled=True,
                                    crop_bg_color=(10, 20, 30),
                                    crop_center=(0.0, 0.0, 0.0),
                                    crop_scale=(1.0, 1.0, 1.0)).serialize())
        ws.send(m.ThresholdMessage(threshold=0.7).serialize())
        ws.send(m.FPSMessage(fps=24.0).serialize())
        ws.send(m.TextPromptMessage(text_prompt="red box").serialize())
        ws.send(m.ClearSamPinsMessage().serialize())

        # camera-path recorder round trip: save, then list
        path_payload = {"keyframes": [], "fps": 24,
                        "seconds": 2, "camera_path": []}
        ws.send(m.CameraPathPayloadMessage(
            camera_path_filename="session_test",
            camera_path=path_payload).serialize())
        ws.send(m.CameraPathOptionsRequest().serialize())
        deadline = time.time() + 60
        while time.time() < deadline and got["paths"] is None:
            try:
                msg = m.Message.deserialize(ws.recv(timeout=5))
            except TimeoutError:
                continue
            if isinstance(msg, m.CameraPathsMessage):
                got["paths"] = msg.payload

        # handler side effects (state is authoritative for render config)
        deadline = time.time() + 30
        while time.time() < deadline and not state.use_search_text:
            time.sleep(0.1)
        assert state.search_text == "chair"
        assert state.use_search_text
        assert state.output_render == "clipseg_feature"
        assert state.crop_enabled
        np.testing.assert_allclose(np.asarray(state.crop_bg),
                                   np.array([10, 20, 30]) / 255.0)
        assert abs(state.threshold - 0.7) < 1e-6  # f32 msgpack round-trip
        assert state.use_fixed_fps
        assert state.text_prompt == "red box"
        assert renderer.prompts is None or len(renderer.prompts) == 0
        assert got["paths"] is not None and \
            "session_test.json" in got["paths"]
        import json as _json
        saved = _json.loads((tmp_path / "camera_paths" /
                             "session_test.json").read_text())
        assert saved == path_payload

    state.render_machine.stop()
