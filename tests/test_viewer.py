"""Viewer wire-protocol and state machine tests (real websocket client)."""
import asyncio
import threading
import time

import numpy as np
import pytest

from samnerf_tpu.viewer import messages as m
from samnerf_tpu.viewer.render_state_machine import (
    camera_from_message, get_prompt_points,
    three_js_perspective_camera_focal_length)
from samnerf_tpu.viewer.server import ViewerServer


def make_cam_msg(xs=(), ys=(), moving=False):
    return m.CameraMessage(
        aspect=1.5, render_aspect=1.5, fov=50.0,
        matrix=tuple(np.eye(4).T.flatten().tolist()),
        camera_type="perspective", is_moving=moving, timestamp=0,
        xs=list(xs), ys=list(ys))


def test_message_roundtrip():
    msg = make_cam_msg(xs=[0.5], ys=[0.25])
    data = msg.serialize()
    out = m.Message.deserialize(data)
    assert isinstance(out, m.CameraMessage)
    assert out.fov == 50.0 and out.xs == [0.5]
    # wire format: msgpack map with 'type' == class name (viser.infra compat)
    import msgpack
    raw = msgpack.unpackb(data)
    assert raw["type"] == "CameraMessage"

    for msg2 in (m.SamMessage(use_sam=True), m.ClearSamPinsMessage(),
                 m.TextPromptMessage(text_prompt="a red ball"),
                 m.ThresholdMessage(threshold=0.7), m.FPSMessage(fps=24.0),
                 m.SearchTextMessage(text="ball", switch_to_heat_map=True),
                 m.StatusMessage(eval_res="64x64px", step=7)):
        assert type(m.Message.deserialize(msg2.serialize())) is type(msg2)


def test_prompt_points_and_camera_from_message():
    msg = make_cam_msg(xs=[0.5, 0.1], ys=[0.5, 0.9])
    pts = get_prompt_points(msg, image_height=100, image_width=200)
    np.testing.assert_array_equal(pts, [[100, 50], [20, 90]])
    intrin, c2w = camera_from_message(msg, 100, 150)
    f = three_js_perspective_camera_focal_length(50.0, 100)
    assert abs(intrin[0, 0] - f) < 1e-5
    assert c2w.shape == (3, 4)


def test_websocket_server_roundtrip():
    import websockets.sync.client as wsc

    server = ViewerServer(host="127.0.0.1", port=17117)
    server.start()
    received = []
    server.register_handler(m.TextPromptMessage,
                            lambda msg: received.append(msg.text_prompt))

    with wsc.connect("ws://127.0.0.1:17117", max_size=None) as ws:
        # server -> client broadcast (incl. buffered replay for late joiners)
        server.broadcast(m.StatusMessage(eval_res="32x32px", step=3))
        data = ws.recv(timeout=5)
        out = m.Message.deserialize(data)
        assert isinstance(out, m.StatusMessage) and out.step == 3
        # client -> server dispatch
        ws.send(m.TextPromptMessage(text_prompt="hello").serialize())
        for _ in range(50):
            if received:
                break
            time.sleep(0.1)
        assert received == ["hello"]

    # late joiner gets buffered state
    with wsc.connect("ws://127.0.0.1:17117", max_size=None) as ws2:
        out = m.Message.deserialize(ws2.recv(timeout=5))
        assert isinstance(out, m.StatusMessage) and out.step == 3


def test_control_panel_elements_and_hidden_logic():
    from samnerf_tpu.viewer import messages as m
    from samnerf_tpu.viewer.control_panel import ControlPanel

    class FakeServer:
        def __init__(self):
            self.sent = []
            self.handlers = {}

        def broadcast(self, msg):
            self.sent.append(msg)

        def register_handler(self, t, cb):
            self.handlers[t] = cb

    srv = FakeServer()
    rerenders = []
    panel = ControlPanel(srv, rerender_cb=lambda: rerenders.append(1))
    names = {x.name for x in srv.sent if isinstance(x, m.GuiAddMessage)}
    assert {"Output Render", "Colormap", "Train Util", "Max Res",
            "Enable SAM", "Text Prompt", "Threshold", "TopK"} <= names
    # SAM controls start hidden
    hidden = {x.name for x in srv.sent
              if isinstance(x, m.GuiSetHiddenMessage) and x.hidden}
    assert "Text Prompt" in hidden

    # enabling SAM reveals the group and triggers a rerender
    srv.sent.clear()
    srv.handlers[m.GuiUpdateMessage](m.GuiUpdateMessage(name="Enable SAM",
                                                        value=True))
    shown = {x.name for x in srv.sent
             if isinstance(x, m.GuiSetHiddenMessage) and not x.hidden}
    assert {"Text Prompt", "Threshold", "TopK", "Send"} <= shown
    assert rerenders
    assert panel["Enable SAM"] is True

    # value callback
    got = []
    panel.on("Threshold", got.append)
    srv.handlers[m.GuiUpdateMessage](m.GuiUpdateMessage(name="Threshold",
                                                        value=0.7))
    assert got == [0.7] and panel["Threshold"] == 0.7


def test_crop_box_rays_and_panel():
    """Viewer crop: generate_rays(aabb_box) sets nears/fars from the box
    intersection (reference cameras.py:463-482) and the panel's crop group
    follows the Crop Viewport toggle (control_panel.py:83-90, 188-199)."""
    import jax.numpy as jnp

    from samnerf_tpu.core.cameras import Cameras, generate_rays
    from samnerf_tpu.viewer import messages as m
    from samnerf_tpu.viewer.control_panel import ControlPanel

    c2w = np.eye(4)[:3, :4].astype(np.float32)
    c2w[2, 3] = 3.0  # camera at z=3 looking down -z
    cams = Cameras(camera_to_worlds=jnp.asarray(c2w[None]),
                   fx=jnp.asarray([[100.0]]), fy=jnp.asarray([[100.0]]),
                   cx=jnp.asarray([[50.0]]), cy=jnp.asarray([[50.0]]),
                   width=100, height=100)
    coords = jnp.asarray([[50.0, 50.0]])  # central ray, dir = -z
    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    rb = generate_rays(cams, jnp.zeros(1, jnp.int32), coords, aabb_box=aabb)
    # central ray enters the unit box at z=1 (t=2) and exits at z=-1 (t=4)
    np.testing.assert_allclose(np.asarray(rb.nears[0, 0]), 2.0, atol=0.02)
    np.testing.assert_allclose(np.asarray(rb.fars[0, 0]), 4.0, atol=0.02)
    # without a box near/far stay unset (model collider applies)
    rb2 = generate_rays(cams, jnp.zeros(1, jnp.int32), coords)
    assert rb2.nears is None and rb2.fars is None

    class FakeServer:
        def __init__(self):
            self.sent = []
            self.handlers = {}

        def broadcast(self, msg):
            self.sent.append(msg)

        def register_handler(self, t, cb):
            self.handlers[t] = cb

    srv = FakeServer()
    panel = ControlPanel(srv, rerender_cb=lambda: None)
    hidden = {x.name for x in srv.sent
              if isinstance(x, m.GuiSetHiddenMessage) and x.hidden}
    assert {"Background color", "Crop Min", "Crop Max"} <= hidden
    srv.sent.clear()
    srv.handlers[m.GuiUpdateMessage](
        m.GuiUpdateMessage(name="Crop Viewport", value=True))
    shown = {x.name for x in srv.sent
             if isinstance(x, m.GuiSetHiddenMessage) and not x.hidden}
    assert {"Background color", "Crop Min", "Crop Max"} <= shown
    assert panel.crop_viewport is True
    srv.handlers[m.GuiUpdateMessage](m.GuiUpdateMessage(
        name="Crop Min", value={"x": -0.5, "y": -0.5, "z": -0.5}))
    assert panel.crop_min == (-0.5, -0.5, -0.5)
    assert panel.background_color == (38, 42, 55)


def test_crop_params_message_updates_viewer_state():
    """CropParamsMessage center/scale -> crop corners on the viewer state
    (reference viewer_state crop handler + messages.py:206-218)."""
    from samnerf_tpu.viewer.viewer_state import ViewerState

    class FakeRenderer:
        def clear_prompts(self):
            pass

    class FakeSrv:
        def __init__(self):
            self.handlers = {}

        def register_handler(self, t, cb):
            self.handlers[t] = cb

    vs = ViewerState.__new__(ViewerState)
    vs.crop_enabled = False
    vs.crop_min = np.zeros(3)
    vs.crop_max = np.zeros(3)
    vs.crop_bg = np.zeros(3)

    class FakeMachine:
        last_cam_msg = None

        def action(self, a):
            pass

    vs.render_machine = FakeMachine()
    msg = m.CropParamsMessage(crop_enabled=True, crop_bg_color=(255, 0, 0),
                              crop_center=(0.0, 0.0, 0.0),
                              crop_scale=(2.0, 2.0, 1.0))
    vs._handle_crop_params(msg)
    assert vs.crop_enabled
    np.testing.assert_allclose(vs.crop_min, [-1.0, -1.0, -0.5])
    np.testing.assert_allclose(vs.crop_max, [1.0, 1.0, 0.5])
    np.testing.assert_allclose(vs.crop_bg, [1.0, 0.0, 0.0])
